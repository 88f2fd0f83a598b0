"""Scalar python-int Poseidon duplex sponge — the bit-exactness oracle.

A deliberately direct transcription of the reference semantics
(/root/reference/src/poseidon/mod.rs) over arbitrary-precision ints.  It is slow,
obviously correct, and is what every batched/JAX/Pallas tier is tested against.
It is NOT on any hot path.

Parity quirks intentionally preserved (SURVEY.md §2.1/§3.2):
  * absorb *adds* into the rate region of the ``capacity ‖ rate`` state
    (mod.rs:128,143);
  * the squeeze loop skips the permutation when the remaining output length equals
    the rate (mod.rs:174-177) — even when ``rate_start_index > 0``, in which case
    already-emitted state is re-read;  do not "fix" this.
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import absorb as absorb_codec
from ..fields import FieldSpec
from ..ops.montgomery import OracleField
from .config import PoseidonConfig

ABSORBING = "absorbing"
SQUEEZING = "squeezing"

FULL = "full"


@dataclass(frozen=True)
class Truncated:
    """``FieldElementSize::Truncated`` (/root/reference/src/lib.rs:36-42)."""

    num_bits: int


def field_element_size_num_bits(size, fs: FieldSpec) -> int:
    """``FieldElementSize::num_bits`` — parity quirk preserved: *always* returns
    MODULUS_BIT_SIZE - 1; ``Truncated(n)`` only bounds-checks and never actually
    truncates (/root/reference/src/lib.rs:45-52)."""
    if isinstance(size, Truncated):
        if size.num_bits > fs.modulus_bit_size:
            raise ValueError("num_bits is greater than the capacity of the field.")
    return fs.modulus_bit_size - 1


def field_element_size_sum(sizes, fs: FieldSpec) -> int:
    """``FieldElementSize::sum`` (/root/reference/src/lib.rs:54-58): total bits
    contributed by a size list (each size yields ``num_bits`` — see quirk above)."""
    return sum(field_element_size_num_bits(s, fs) for s in sizes)


def bits_le_to_bytes(bits) -> bytes:
    """LE bit chunks -> bytes, as in the nonnative squeeze (lib.rs:83-94)."""
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            if bit:
                byte |= 1 << j
        out.append(byte)
    return bytes(out)


@dataclass
class SpongeState:
    """Externalized sponge state — ``SpongeExt``/``PoseidonSpongeState``
    (/root/reference/src/lib.rs:188-195, poseidon/mod.rs:344-367)."""

    state: list  # canonical ints, length t
    mode: str
    index: int


class OraclePoseidonSponge:
    """Reference-exact duplex sponge over python ints (state layout capacity‖rate)."""

    def __init__(self, cfg: PoseidonConfig):
        self.cfg = cfg
        self.f = OracleField(cfg.field)
        self.state = [0] * cfg.t  # zero-init, mod.rs:220
        self.mode = ABSORBING
        self.index = 0  # next absorb/squeeze index within the rate

    # ---- permutation (mod.rs:95-118) ----

    def _apply_sbox(self, state, is_full_round: bool):
        alpha = self.cfg.alpha
        if is_full_round:
            for i in range(len(state)):
                state[i] = self.f.pow(state[i], alpha)
        else:
            state[0] = self.f.pow(state[0], alpha)

    def _apply_ark(self, state, round_number: int):
        for i in range(len(state)):
            state[i] = self.f.add(state[i], self.cfg.ark[round_number][i])

    def _apply_mds(self, state):
        mds = self.cfg.mds
        new_state = []
        for i in range(len(state)):
            cur = 0
            for j in range(len(state)):
                cur = self.f.add(cur, self.f.mul(state[j], mds[i][j]))
            new_state.append(cur)
        state[:] = new_state

    def permute(self):
        half_full = self.cfg.full_rounds // 2
        state = list(self.state)
        for r in range(half_full):
            self._apply_ark(state, r)
            self._apply_sbox(state, True)
            self._apply_mds(state)
        for r in range(half_full, half_full + self.cfg.partial_rounds):
            self._apply_ark(state, r)
            self._apply_sbox(state, False)
            self._apply_mds(state)
        for r in range(half_full + self.cfg.partial_rounds, self.cfg.rounds):
            self._apply_ark(state, r)
            self._apply_sbox(state, True)
            self._apply_mds(state)
        self.state = state

    # ---- duplex state machine (mod.rs:121-182, 232-341) ----

    def _absorb_internal(self, rate_start_index: int, elements):
        cfg = self.cfg
        remaining = list(elements)
        while True:
            if rate_start_index + len(remaining) <= cfg.rate:
                for i, elem in enumerate(remaining):
                    idx = cfg.capacity + i + rate_start_index
                    self.state[idx] = self.f.add(self.state[idx], elem)
                self.mode = ABSORBING
                self.index = rate_start_index + len(remaining)
                return
            num_absorbed = cfg.rate - rate_start_index
            for i in range(num_absorbed):
                idx = cfg.capacity + i + rate_start_index
                self.state[idx] = self.f.add(self.state[idx], remaining[i])
            self.permute()
            remaining = remaining[num_absorbed:]
            rate_start_index = 0

    def _squeeze_internal(self, rate_start_index: int, num: int):
        cfg = self.cfg
        out = []
        remaining = num
        while True:
            if rate_start_index + remaining <= cfg.rate:
                s = cfg.capacity + rate_start_index
                out.extend(self.state[s : s + remaining])
                self.mode = SQUEEZING
                self.index = rate_start_index + remaining
                return out
            num_squeezed = cfg.rate - rate_start_index
            s = cfg.capacity + rate_start_index
            out.extend(self.state[s : s + num_squeezed])
            # Parity quirk: no permute when the remaining output exactly equals the
            # rate (mod.rs:174-177).
            if remaining != cfg.rate:
                self.permute()
            remaining -= num_squeezed
            rate_start_index = 0

    def absorb_field_elements(self, elems):
        """Absorb pre-encoded native field elements (mod.rs:232-254)."""
        elems = [e % self.cfg.field.modulus for e in elems]
        if not elems:
            return
        if self.mode == ABSORBING:
            absorb_index = self.index
            if absorb_index == self.cfg.rate:
                self.permute()
                absorb_index = 0
            self._absorb_internal(absorb_index, elems)
        else:
            self.permute()
            self._absorb_internal(0, elems)

    def squeeze_native_field_elements(self, num: int):
        """mod.rs:321-341."""
        if self.mode == ABSORBING:
            self.permute()
            return self._squeeze_internal(0, num)
        squeeze_index = self.index
        if squeeze_index == self.cfg.rate:
            self.permute()
            squeeze_index = 0
        return self._squeeze_internal(squeeze_index, num)

    # ---- full CryptographicSponge surface (lib.rs:105-183, mod.rs:232-317) ----

    def absorb(self, x):
        """Absorb any codec-able value (mod.rs:232-254 over the Absorb codec)."""
        elems = absorb_codec.to_sponge_field_elements(x, self.cfg.field)
        self.absorb_field_elements(elems)

    def squeeze_bytes(self, num_bytes: int):
        """mod.rs:256-270: low ``(MODULUS_BIT_SIZE-1)/8`` LE bytes of each element."""
        fs = self.cfg.field
        usable_bytes = (fs.modulus_bit_size - 1) // 8
        num_elements = (num_bytes + usable_bytes - 1) // usable_bytes
        elems = self.squeeze_native_field_elements(num_elements)
        out = bytearray()
        for e in elems:
            out.extend(fs.to_bytes_le(e)[:usable_bytes])
        return bytes(out[:num_bytes])

    def squeeze_bits(self, num_bits: int):
        """mod.rs:272-286: low ``MODULUS_BIT_SIZE-1`` LE bits of each element."""
        fs = self.cfg.field
        usable_bits = fs.modulus_bit_size - 1
        num_elements = (num_bits + usable_bits - 1) // usable_bits
        elems = self.squeeze_native_field_elements(num_elements)
        bits = []
        for e in elems:
            bits.extend(((e >> i) & 1) == 1 for i in range(usable_bits))
        return bits[:num_bits]

    def squeeze_field_elements_with_sizes(self, target_fs: FieldSpec, sizes):
        """mod.rs:288-304: native fast path via field_cast, else default bit impl."""
        fs = self.cfg.field
        if fs.modulus == target_fs.modulus:
            native = self.squeeze_native_field_elements_with_sizes(sizes)
            return [v % target_fs.modulus for v in native]
        return self._squeeze_nonnative_default(target_fs, sizes)

    def squeeze_field_elements(self, target_fs: FieldSpec, num: int):
        """mod.rs:306-317 (the TypeId fast path is modulus equality here)."""
        fs = self.cfg.field
        if fs.modulus == target_fs.modulus:
            return list(self.squeeze_native_field_elements(num))
        return self.squeeze_field_elements_with_sizes(target_fs, [FULL] * num)

    def squeeze_native_field_elements_with_sizes(self, sizes):
        """lib.rs:168-182: all-Full fast path, else the default bit-packing impl."""
        if all(s == FULL for s in sizes):
            return self.squeeze_native_field_elements(len(sizes))
        return self._squeeze_nonnative_default(self.cfg.field, sizes)

    def _squeeze_nonnative_default(self, target_fs: FieldSpec, sizes):
        """squeeze_field_elements_with_sizes_default_impl (lib.rs:61-100).

        NOTE: ``num_bits`` is computed against the *target* field (the generic F in
        lib.rs:61 is the output field, instantiated as F2 at mod.rs:302), i.e.
        every size contributes MODULUS_BIT_SIZE(F2) - 1 bits — while the bits
        themselves are squeezed through the native field's squeeze_bits.
        """
        if len(sizes) == 0:
            return []
        per = [field_element_size_num_bits(s, target_fs) for s in sizes]
        bits = self.squeeze_bits(sum(per))
        out = []
        pos = 0
        for n in per:
            window = bits[pos : pos + n]
            pos += n
            out.append(target_fs.from_le_bytes_mod_order(bits_le_to_bytes(window)))
        return out

    def fork(self, domain: bytes) -> "OraclePoseidonSponge":
        """Domain separation (lib.rs:149-157): clone, absorb len(domain)‖domain."""
        new = self.clone()
        payload = absorb_codec.to_sponge_bytes(
            absorb_codec.Usize(len(domain))
        ) + bytes(domain)
        new.absorb(payload)
        return new

    def clone(self) -> "OraclePoseidonSponge":
        new = type(self)(self.cfg)  # subclass-safe (e.g. OraclePoseidon2Sponge)
        new.state = list(self.state)
        new.mode = self.mode
        new.index = self.index
        return new

    # ---- SpongeExt (lib.rs:188-195) ----

    def into_state(self) -> SpongeState:
        return SpongeState(state=list(self.state), mode=self.mode, index=self.index)

    @classmethod
    def from_state(cls, state: SpongeState, cfg: PoseidonConfig):
        new = cls(cfg)
        new.state = list(state.state)
        new.mode = state.mode
        new.index = state.index
        return new
