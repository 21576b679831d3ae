"""Headline benchmark — prints ONE JSON line.

Protocol (ref main.cpp:187-188 + BASELINE.json config 3): 27-pt stencil,
nx=ny=nz=100, fixed work (max_iter=150, tolerance=0), f32, single chip.
The timed region is the full jitted CG solve (SpMV + halo + ddots + axpbys),
i.e. end-to-end CG throughput, not a kernel microbenchmark.

Metric: SpMV nonzeros processed per second through full CG iterations
(nnz_model * niters / t, nnz_model = 27*nrow, the reference's own FLOP-model
convention, main.cpp:226).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the reference *format's* per-chip speed-of-light on THIS chip: an explicit
CSR SpMV must move >= 12 B per nonzero (8 B value + 4 B column index), so
SOL_ref = HBM_BW / 12 nnz/s. vs_baseline = ours / SOL_ref. Values > 1 mean we
exceed what the reference's data structure could ever reach on this hardware
(possible because the stencil operator never materializes the matrix).
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp


HBM_GBPS = {
    # device_kind substring -> HBM bandwidth in GB/s
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v5": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
    "v2": 700.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def hbm_bandwidth_gbps(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default (v5e)


def main():
    # The remote-tunnel backend can HANG (not fail) on device init or
    # compile when the tunnel flaps; a silent eternal hang loses the whole
    # bench run. Convert it into a diagnosable abort: dump all threads'
    # tracebacks and exit after BENCH_WATCHDOG_S (0 disables).
    import faulthandler
    import os
    import sys as _sys

    try:
        watchdog_s = float(os.environ.get("BENCH_WATCHDOG_S", "2400") or 0)
    except ValueError:
        print(
            "# BENCH_WATCHDOG_S is not a number; using the 2400 s default",
            file=_sys.stderr,
        )
        watchdog_s = 2400.0
    if watchdog_s > 0:
        faulthandler.dump_traceback_later(watchdog_s, exit=True)

    from hpccg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=100)
    ap.add_argument("--ny", type=int, default=100)
    ap.add_argument("--nz", type=int, default=100)
    ap.add_argument("--stencil", type=int, default=27, choices=[7, 27])
    ap.add_argument("--max-iter", type=int, default=150)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument(
        "--backend",
        default="auto",
        help="auto (megakernel if it fits VMEM, else pallas) | megakernel | "
        "pallas | pallas_v1 | stencil | ell",
    )
    ap.add_argument(
        "--preset",
        choices=["parity32", "fused64", "headline100", "weak-unit", "strong256"],
        help="BASELINE.json config shortcuts: parity32 = 27-pt 32^3 "
        "(config 1), fused64 = 7-pt 64^3 (config 2), headline100 = 27-pt "
        "100^3 (config 3, the default), weak-unit = the 100^3 per-chip "
        "weak-scaling block (config 4; multi-host runs via hpccg_tpu.sweep "
        "on a pod), strong256 = global 256^3 on this chip (config 5)",
    )
    args = ap.parse_args()

    if args.preset:
        import sys as _sys

        if (args.nx, args.ny, args.nz, args.stencil) != (100, 100, 100, 27):
            print(
                "# --preset overrides --nx/--ny/--nz/--stencil",
                file=_sys.stderr,
            )
        dims = {
            "parity32": (32, 27),
            "fused64": (64, 7),
            "headline100": (100, 27),
            "weak-unit": (100, 27),
            "strong256": (256, 27),
        }[args.preset]
        args.nx = args.ny = args.nz = dims[0]
        args.stencil = dims[1]

    from hpccg_tpu import ProblemConfig, generate_problem
    from hpccg_tpu.solver import make_cg

    dtype = jnp.dtype(args.dtype)
    cfg = ProblemConfig(args.nx, args.ny, args.nz, stencil=args.stencil, dtype=dtype)
    prob = generate_problem(cfg)

    if args.backend == "auto":
        from hpccg_tpu.solver import resolve_backend

        args.backend = resolve_backend(prob.A, "auto")

    def fence(r):
        # scalar host readback: block_until_ready alone can return before the
        # device queue drains on remote-dispatch backends (verified on axon)
        float(r.normr)
        return r

    def timed(max_iter):
        solve = make_cg(prob.A, max_iter=max_iter, tolerance=0.0, backend=args.backend)
        fence(solve(prob.b, prob.x0))  # compile
        fence(solve(prob.b, prob.x0))
        times = []
        res = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res = fence(solve(prob.b, prob.x0))
            times.append(time.perf_counter() - t0)
        # min, not median: dispatch/tunnel noise is strictly additive, so the
        # fastest rep is the closest estimate of the device-side cost
        return min(times), res

    # Slope timing: per-dispatch latency (tens of ms through the remote
    # tunnel, unrepresentative of sustained/pipelined serving throughput)
    # cancels between the two run lengths. The spread must be large enough
    # that the marginal work rises well above the few-ms dispatch jitter.
    # The chip's effective clock also drifts over minutes, so measure the
    # (short, long) pair INTERLEAVED several times and take the median of
    # the per-pair slopes — a pair shares one clock epoch.
    # (off-TPU the 8192-iteration leg would take minutes; keep CI/CPU sane)
    long_leg = 8192 if jax.default_backend() == "tpu" else 256
    k1, k2 = 64, max(args.max_iter - 1, long_leg)
    solve1 = make_cg(prob.A, max_iter=k1 + 1, tolerance=0.0, backend=args.backend)
    solve2 = make_cg(prob.A, max_iter=k2 + 1, tolerance=0.0, backend=args.backend)
    res_short = fence(solve1(prob.b, prob.x0))
    res_long = fence(solve2(prob.b, prob.x0))
    # tiny problems can converge to an EXACTLY zero residual and exit the
    # tolerance=0 loop early; the slope stays valid over the iterations that
    # actually ran, as long as the two legs differ enough
    k1_real, k2_real = int(res_short.niters), int(res_long.niters)
    assert k2_real >= 2 * k1_real, (
        f"long leg exited too early for slope timing ({k2_real} vs {k1_real} "
        "iterations); use a larger problem"
    )
    slopes = []
    for _ in range(max(args.reps, 3)):
        t0 = time.perf_counter()
        fence(solve1(prob.b, prob.x0))
        t1 = time.perf_counter()
        fence(solve2(prob.b, prob.x0))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2_real - k1_real))
    per_iter = max(statistics.median(slopes), 1e-12)

    # the headline run itself (end-to-end, dispatch included)
    t_e2e, res = timed(args.max_iter)

    # standalone SpMV kernel (the BASELINE metric's "SpMV GB/s + nnz/s per
    # chip"): slope-timed ping-pong of the one-pass stencil kernel
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3, padded_dims, spmv_padded_v2
    from hpccg_tpu.utils.timing import time_loop_body

    u0 = pad_plane3(prob.A, prob.b)
    nzp, nyp, nxp = padded_dims(prob.A, dtype)

    def spmv_body(u):
        return spmv_padded_v2(prob.A, u) * (1.0 / 54.0)

    t_spmv = time_loop_body(spmv_body, u0, iters=32)
    spmv_bytes = 2 * nzp * nyp * nxp * dtype.itemsize  # read x + write y
    spmv_gbps = spmv_bytes / t_spmv / 1e9 if t_spmv > 0 else float("inf")
    spmv_gnnz = (
        prob.total_nnz_model / t_spmv / 1e9 if t_spmv > 0 else float("inf")
    )

    niters = int(res.niters)
    nnz_model = prob.total_nnz_model
    nnz_per_s = nnz_model / per_iter
    value_gnnz = nnz_per_s / 1e9
    t = t_e2e

    dev = jax.devices()[0]
    sol_ref_nnz_per_s = hbm_bandwidth_gbps(dev) * 1e9 / 12.0
    vs_baseline = nnz_per_s / sol_ref_nnz_per_s

    iters_per_s = 1.0 / per_iter
    flops_per_iter = (4.0 + 6.0) * prob.total_nrow + 2.0 * nnz_model  # main.cpp:224-227

    print(
        json.dumps(
            {
                "metric": "CG SpMV throughput (stencil*n nnz model), single chip",
                "value": round(value_gnnz, 3),
                "unit": "Gnnz/s",
                "vs_baseline": round(vs_baseline, 3),
                "extras": {
                    "device": getattr(dev, "device_kind", str(dev)),
                    "backend": args.backend,
                    "problem": f"{args.nx}x{args.ny}x{args.nz} {args.stencil}-pt {args.dtype}",
                    "niters": niters,
                    "cg_iter_us": round(per_iter * 1e6, 2),
                    "spmv_us": round(t_spmv * 1e6, 2),
                    "spmv_gbps_2pass": round(spmv_gbps, 1),
                    "spmv_gnnz_per_s": round(spmv_gnnz, 1),
                    "cg_iters_per_s": round(iters_per_s, 1),
                    "solve_e2e_s": round(t, 6),
                    "mflops_model": round(flops_per_iter / per_iter / 1e6, 1),
                    "final_normr": float(res.normr),
                    "timing": f"slope between {k1+1}- and {k2+1}-iteration solves; per-dispatch tunnel latency excluded",
                    "other_paths": "general explicit matrices: blocked-DIA 188 Gslots/s @ 257 diag x 1M rows (f32); double-f32 f64 DIA 68 Gslots/s @ 301 diag x 262k rows (2.9e-14 rel err); gather-ELL 13-25 Gnnz/s by bandwidth (distributed via ppermute window strips); WIDE scatter via the dynamic-window gather tier 2.6-15.8 Gnnz/s by inflation (100^3 permuted target 13.6 = 6.3x the round-4 strip stack, 104x the take-gather fallback; f64 dd variant 4.9e-15 rel; distributed = tile shards, woff rebased per shard, all-gathered x; strip stack retained where its model wins); bf16 whole-solve: megakernel to 200^3, STREAMING kernel to 256^3 (366 us/iter — 1.66x the pallas-v2 bf16 tier, 3.4x the f32 floor), pallas-v2 past; --method cg1/pipecg on every distributed tier; pod model + measured bases in SWEEP_r04.json; see PERF.md + REPRODUCE.md",
                    "vs_baseline_def": "ours / (HBM_BW/12B-per-nnz), the reference CSR format's per-chip speed-of-light",
                },
            }
        )
    )
    if watchdog_s > 0:
        faulthandler.cancel_dump_traceback_later()


if __name__ == "__main__":
    main()
