"""AbsorbGadget: the in-circuit Absorb codec over tracer variables.

Mirror of /root/reference/src/constraints/absorb.rs: every circuit type converts
into a list of ``FpVar`` (field-element wire format).  Byte batches are
length-prefixed with a *constant* length (legitimately constant: circuit shape is
static, absorb.rs:63-69) and packed through the same 31-byte chunking as the
native ``ToConstraintField`` — here as linear combinations over the byte bits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..fields import FieldSpec
from .r1cs import Boolean, ConstraintSystem, FpVar, LinearCombination, UInt8


@dataclass
class TEPointVar:
    """Twisted-Edwards affine point gadget: absorbs as [x, y]
    (constraints/absorb.rs:125-128 via to_constraint_field)."""

    x: FpVar
    y: FpVar

    def to_field_elements(self) -> List[FpVar]:
        return [self.x, self.y]


@dataclass
class SWPointVar:
    """Short-Weierstrass affine point gadget: absorbs as [x, y, infinity]."""

    x: FpVar
    y: FpVar
    infinity: Boolean

    def to_field_elements(self) -> List[FpVar]:
        return [self.x, self.y, self.infinity.to_fp()]


def bytes_to_field_elements_gadget(
    bytes_vars: List[UInt8], cs: ConstraintSystem, fs: FieldSpec
) -> List[FpVar]:
    """UInt8 list -> FpVar list via 31-byte LE chunk packing (constraint-free:
    pure linear combination of the constituent bits, as ark's
    ``to_constraint_field`` for bytes)."""
    max_size = (fs.modulus_bit_size - 1) // 8
    p = fs.modulus
    out = []
    for i in range(0, len(bytes_vars), max_size):
        chunk = bytes_vars[i : i + max_size]
        lc = LinearCombination()
        val = 0
        weight = 0
        has_var = False
        for byte in chunk:
            for j, bit in enumerate(byte.bits):
                w = pow(2, weight + j, p)
                lc = lc.plus(bit.var.lc.scaled(w, p), p)
                val += int(bit.value) << (weight + j)
                has_var = has_var or not bit.var.is_constant
            weight += 8
        out.append(FpVar(cs if has_var else None, lc, val % p, fs))
    return out


def to_sponge_field_elements_gadget(x, cs: ConstraintSystem, fs: FieldSpec) -> List[FpVar]:
    """Dispatch mirroring the AbsorbGadget impls (constraints/absorb.rs:54-196)."""
    if isinstance(x, FpVar):
        return [x]
    if isinstance(x, Boolean):
        return [x.to_fp()]
    if isinstance(x, UInt8):
        return bytes_to_field_elements_gadget([x], cs, fs)
    if isinstance(x, (TEPointVar, SWPointVar)):
        return x.to_field_elements()
    if isinstance(x, list):
        if x and all(isinstance(e, UInt8) for e in x):
            # u8 batch: constant u64 LE length prefix + packing (absorb.rs:63-69).
            prefix = UInt8.constant_vec(len(x).to_bytes(8, "little"), fs)
            return bytes_to_field_elements_gadget(prefix + x, cs, fs)
        if x and all(isinstance(e, FpVar) for e in x):
            return list(x)  # FpVar batch: identity (absorb.rs:92-94)
        out: List[FpVar] = []
        for e in x:
            out.extend(to_sponge_field_elements_gadget(e, cs, fs))
        return out
    raise TypeError(f"not gadget-absorbable: {type(x)!r}")
