#!/bin/bash
# Re-measure every bench probe under the hardened warm+best-of-3 protocol
# (VERDICT r4 task 1: the single-window numbers behind BENCHMARKS.md were
# invalidated by the round-4 timing audit; this regenerates all of them at
# HEAD on a quiet box).  One probe at a time — concurrent probes perturb
# each other's timing windows.  Outputs: $OUT/<probe>.log (full output) and
# $OUT/summary.tsv (probe, wall seconds, rc).
set -u
OUT=${1:-/tmp/remeasure}
PER_PROBE_TIMEOUT=${PER_PROBE_TIMEOUT:-1500}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  start=$(date +%s)
  timeout "$PER_PROBE_TIMEOUT" python "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  end=$(date +%s)
  echo -e "$name\t$((end-start))\t$rc" >> "$OUT/summary.tsv"
  echo "$name: $((end-start))s rc=$rc"
}

# Cheap / newly-changed probes first (fail fast on breakage), then the
# heavy family sweeps, the headline bench last on the quietest box.
run uint32_probe        bench/uint32_probe.py
run vpu_roofline_probe  bench/vpu_roofline_probe.py
run limb13_probe        bench/limb13_probe.py
run limb13_probe_r4     bench/limb13_probe.py 4
run limb13_probe_r8     bench/limb13_probe.py 8
run relaxed_probe       bench/relaxed_probe.py
run sweep_probe         bench/sweep_probe.py
run pipeline_probe      bench/pipeline_probe.py
run wide_probe          bench/wide_probe.py
run wide_interleave_probe bench/wide_interleave_probe.py
run mds_mxu_probe       bench/mds_mxu_probe.py
run p2_probe            bench/p2_probe.py
run goldilocks_probe    bench/goldilocks_probe.py
run babybear_probe      bench/babybear_probe.py
run koalabear_probe     bench/koalabear_probe.py
run monolith_probe      bench/monolith_probe.py
run gmimc_kernel_probe  bench/gmimc_kernel_probe.py
run rescue_probe        bench/rescue_probe.py
run families_probe      bench/families_probe.py
run griffin_streams_probe bench/griffin_streams_probe.py
run jive_tile_probe     bench/jive_tile_probe.py
run merkle_smallfield_probe bench/merkle_smallfield_probe.py
run family_census_probe bench/family_census_probe.py
run latency_probe       bench/latency_probe.py
run latency_accounting_probe bench/latency_accounting_probe.py
run full_bench          bench/full_bench.py
run bench_headline      bench.py
echo DONE >> "$OUT/summary.tsv"
