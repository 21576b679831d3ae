#!/usr/bin/env bash
# On-chip validation batch — run when the TPU tunnel is healthy.
#
#   bash exp/chip_checklist.sh [quick]
#
# Order matters: correctness first (cheap compiles), then the benches.
# Each step is independently timed out so one flaky compile cannot eat
# the session; a step failure does not stop the rest (the summary at the
# end lists per-step status). "quick" runs only the two correctness steps.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# persistent XLA compile cache (the exp scripts don't call utils/cache.py
# themselves): re-runs of this batch skip the minutes-long f64 compiles.
# HPCCG_CACHE_DIR is exported alongside so the drivers (bench.py step 3,
# which calls enable_compilation_cache) share the SAME cache directory.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${HPCCG_CACHE_DIR:-$HOME/.cache/hpccg_tpu/xla}}"
export HPCCG_CACHE_DIR="${HPCCG_CACHE_DIR:-$JAX_COMPILATION_CACHE_DIR}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

declare -a NAMES RCS
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$name] $* (timeout ${t}s)"
  timeout "$t" "$@"
  local rc=$?
  NAMES+=("$name"); RCS+=("$rc")
  echo "=== [$name] rc=$rc"
}

# 0. tunnel reachability (fail fast instead of hanging a long step) — and
# the devices must actually be TPUs: with JAX_PLATFORMS=cpu exported (the
# documented CPU-work pattern) everything below would "pass" on CPU and
# record bogus numbers as chip-validated
run probe        120  python -c "import jax; d = jax.devices(); print(d); assert d[0].platform == 'tpu', f'not a TPU: {d[0]}'"
if [ "${RCS[0]}" != 0 ]; then echo "TUNNEL DOWN or not a TPU — aborting"; exit 1; fi

# bench.py's own hang watchdog must fire BEFORE this script's step timeout
# kills it, or the diagnostic thread dump is lost
export BENCH_WATCHDOG_S=1100

# 1. Mosaic-under-x64 lowering: every dd kernel + f32 tiers under x64
run x64-lowering 1200 python exp/x64_lowering_check.py

# 2. tpu-marked tests (vmem fit boundaries + the x64 wrapper)
run tpu-tests    2400 python -m pytest tests/ -m tpu -q

if [ "${1:-}" = quick ]; then
  printf '%s\n' "--- summary ---"; paste <(printf '%s\n' "${NAMES[@]}") <(printf '%s\n' "${RCS[@]}")
  exit 0
fi

# 3. headline bench (the driver's metric; one JSON line)
run bench        1200 python bench.py

# 4. dd DIA wide-band bench (expected ~1.16 ms/iter, rel err ~3e-14)
run dd-bench     2400 python exp/dd_bench.py

# 5. gather-ELL bandwidth sweep (expected 13-25 Gnnz/s by bandwidth)
run gell-bench   2400 python exp/gell_bench.py

# 6. dd-tier speeds: gather-ELL dd matvec + pallas_dd stencil matvec/CG
run dd-tiers     3000 python exp/dd_tiers_bench.py

echo "--- summary ---"
paste <(printf '%s\n' "${NAMES[@]}") <(printf '%s\n' "${RCS[@]}")
