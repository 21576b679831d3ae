"""CLI driver (ref main.cpp:99-324).

Usage:
    python -m hpccg_tpu nx ny nz [options]     # generated stencil problem
    python -m hpccg_tpu datafile [options]     # HPC-row file (deprecated path)

Reproduces the reference driver end-to-end: per-iteration residual lines,
the FLOP model (main.cpp:224-227), and the YAML report with the reference's
key schema (Time/FLOPS/MFLOPS summaries) — plus a Mesh block in place of the
SYCL device printout, and distributed-overhead sections mirroring the MPI
build's DDOT Timing Variations / SPARSEMV OVERHEADS blocks.

One deliberate difference: the reference times kernels with in-loop TICK/TOCK
macros (HPCCG.cpp:71-72), which would require breaking the fused jitted loop.
Here the whole-solve time is measured directly and per-kernel times come from
phase-separated micro-benchmarks of the same jitted kernels (SURVEY.md §5),
scaled by per-iteration call counts (2 ddot, 3 waxpby, 1 spmv — HPCCG.cpp
:367-384).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hpccg_tpu",
        description="TPU-native HPCCG: 3-D stencil conjugate gradient benchmark",
    )
    ap.add_argument("dims", nargs="+", help="nx ny nz, or an HPC-row data file")
    ap.add_argument("--stencil", type=int, default=27, choices=[27, 7])
    ap.add_argument("--max-iter", type=int, default=150, help="ref main_old.cpp:166 default; main.cpp uses 500 (--preset ref500)")
    ap.add_argument("--tolerance", type=float, default=0.0)
    ap.add_argument(
        "--preset",
        choices=["ref500", "ref150"],
        help="solve-protocol shortcuts: ref500 = max_iter 500, tolerance 0 "
        "(the reference benchmark protocol, main.cpp:187-188); ref150 = "
        "max_iter 150 (main_old.cpp:166). Overrides --max-iter/--tolerance",
    )
    ap.add_argument("--dtype", default="float64", choices=["float64", "float32", "bfloat16"])
    ap.add_argument(
        "--mesh",
        default="1",
        metavar="N|HxZ",
        help="device mesh: a plain integer N builds the 1-D z mesh; HxZ "
        "(e.g. 2x4) builds the explicit 2-D ('host','z') mesh — same row "
        "layout, but XLA lowers within-host halo pairs to ICI and exactly "
        "hosts-1 slice-boundary pairs to DCN (parallel/mesh.py)",
    )
    ap.add_argument(
        "--backend",
        default="auto",
        choices=[
            "auto",
            "stencil",
            "ell",
            "dia",
            "pallas",
            "pallas_dd",
            "pallas_v1",
            "pallas_fused",
            "megakernel",
            "streamkernel",
            "collective",
        ],
    )
    ap.add_argument(
        "--method",
        default="cg",
        choices=["cg", "cg1", "pipecg"],
        help="cg: the reference recurrence (2 reductions/iter); cg1: "
        "Chronopoulos-Gear single-reduction CG (1 fused psum/iter); pipecg: "
        "Ghysels-Vanroose pipelined CG (the psum overlaps the SpMV)",
    )
    ap.add_argument(
        "--rr-every",
        type=int,
        default=0,
        metavar="K",
        help="residual replacement for --method cg1/pipecg: re-anchor the "
        "recurrence residual to the true b - A x every K iterations (one "
        "extra matvec) — cures the f32 recurrence flush-to-zero on long "
        "tolerance=0 runs; 0 = off. Applies to single-device and every "
        "distributed shard_map tier (not the in-kernel collective "
        "recurrences)",
    )
    ap.add_argument("--report-file", action="store_true", help="also write the timestamped .yaml")
    ap.add_argument("--json", action="store_true", help="emit JSON instead of YAML")
    ap.add_argument("--quiet", action="store_true", help="suppress residual lines")
    ap.add_argument("--dump-matlab", metavar="PREFIX", help="dump COO triplets (ref dump_matlab_matrix.cpp)")
    ap.add_argument(
        "--no-reorder",
        action="store_true",
        help="file mode: disable RCM bandwidth-reducing reordering (solve "
        "in the file's original row order even if a hidden band exists)",
    )
    ap.add_argument(
        "--stream-load",
        action="store_true",
        help="file mode at --mesh > 1: bounded-memory distributed loading — "
        "each process streams ONLY its devices' row blocks straight onto "
        "those devices (the reference's per-rank read, "
        "read_HPC_row.cpp:255-293); the global matrix is never materialized "
        "on any host. Trades structure analysis (RCM/DIA/gell need the "
        "assembled matrix) for O(n/N) per-process memory: the solve runs "
        "the general all-gather ELL path",
    )
    ap.add_argument("--skip-kernel-bench", action="store_true", help="skip per-kernel micro-benchmarks")
    ap.add_argument(
        "--check",
        action="store_true",
        help="report max|x - xexact| after the solve (ref compute_residual, "
        "main.cpp:310-316 — commented out in the reference)",
    )
    ap.add_argument(
        "--validate",
        action="store_true",
        help="verify problem invariants before solving (A@xexact == b, "
        "symmetry) and fail fast on a non-finite result",
    )
    ap.add_argument(
        "--init-distributed",
        action="store_true",
        help="call jax.distributed.initialize() first (multi-host pods; "
        "coordinator discovery via the standard TPU environment)",
    )
    ap.add_argument(
        "--refine",
        type=int,
        default=0,
        metavar="N",
        help="mixed-precision iterative refinement: N outer f64 residual "
        "rounds around f32 inner solves (requires --dtype float64); "
        "f64-floor accuracy at f32 kernel speed on TPU",
    )
    ap.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a jax.profiler device trace of the solve into DIR "
        "(the TPU-native analog of the TICK/TOCK kernel timers)",
    )
    return ap


def parse_mesh(spec) -> tuple:
    """'N' -> (N, None); 'HxZ' -> (H*Z, (H, Z))."""
    spec = str(spec)
    if "x" in spec:
        try:
            h, z = (int(p) for p in spec.split("x"))
        except ValueError:
            raise SystemExit(f"error: --mesh {spec!r} is not N or HxZ")
        if h < 1 or z < 1:
            raise SystemExit(f"error: --mesh {spec!r} needs positive factors")
        return h * z, (h, z)
    try:
        return int(spec), None
    except ValueError:
        raise SystemExit(f"error: --mesh {spec!r} is not N or HxZ")


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.preset:
        args.max_iter = {"ref500": 500, "ref150": 150}[args.preset]
        args.tolerance = 0.0
    args.mesh, mesh2d_shape = parse_mesh(args.mesh)

    import os

    import jax

    # honor JAX_PLATFORMS=cpu by PINNING the config: plugin registrations
    # (e.g. the axon TPU tunnel's sitecustomize) can monkeypatch backend
    # resolution so a plain env var still initializes — and block on — the
    # remote device; the programmatic pin short-circuits that (same as the
    # test-suite conftest)
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        jax.config.update("jax_platforms", env_platforms)

    from hpccg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.init_distributed:
        jax.distributed.initialize()
    # multi-host: only process 0 prints/writes (every process still computes)
    if jax.process_index() != 0:
        args.quiet = True
        args.report_file = False

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        if jax.default_backend() == "tpu":
            print(
                "# note: f64 on TPU has an f32 exponent range (values "
                "< ~1e-38 flush to zero); generated problems ride the "
                "double-float (two-f32) Pallas stencil kernel "
                "(backend=pallas_dd, f64-class accuracy); use CPU for "
                "bit-exact deep-convergence parity, or --refine for "
                "f64-floor accuracy from fast f32 kernels",
                file=sys.stderr,
            )
    import jax.numpy as jnp

    from hpccg_tpu import ProblemConfig, generate_problem
    from hpccg_tpu.ops.spmv import spmv
    from hpccg_tpu.ops.vector import waxpby as waxpby_op
    from hpccg_tpu.solver import make_cg
    from hpccg_tpu.utils.report import Report
    from hpccg_tpu.utils.timing import fence, time_fn

    dtype = jnp.dtype(args.dtype)

    def build_mesh():
        """(mesh, row axis) for --mesh: 1-D 'z' or 2-D ('host','z')."""
        from hpccg_tpu.parallel import make_mesh, make_mesh2d, row_axis

        if mesh2d_shape is not None:
            m = make_mesh2d(*mesh2d_shape)
            return m, row_axis(m)
        return make_mesh(args.mesh), "z"

    file_mode = len(args.dims) == 1 and not args.dims[0].isdigit()
    mesh = None
    axis = "z"
    if file_mode and args.stream_load:
        if args.mesh <= 1:
            print(
                "# --stream-load needs --mesh > 1 (distributed loading); "
                "ignoring",
                file=sys.stderr,
            )
            args.stream_load = False
        elif args.backend not in ("auto", "ell"):
            print(
                f"# --stream-load runs the all-gather ELL path; ignoring "
                f"--backend {args.backend}",
                file=sys.stderr,
            )
            args.backend = "auto"
    if file_mode and args.stream_load:
        # bounded-memory distributed loading (round-3 VERDICT #4): blocks
        # stream straight onto their devices; no host ever holds the matrix
        from hpccg_tpu.io import read_hpc_row_sharded
        from hpccg_tpu.parallel import make_distributed_ell_cg

        mesh, axis = build_mesh()
        prob, _x_file = read_hpc_row_sharded(args.dims[0], mesh, axis=axis, dtype=dtype)
        perm = None
        file_nrow = prob.total_nrow
        nx = ny = nz = 0
        print(
            "# stream-load: per-device row blocks, all-gather ELL solve "
            "(structure analysis skipped — it needs the assembled matrix)",
            file=sys.stderr,
        )
        _esolve = make_distributed_ell_cg(
            mesh, max_iter=args.max_iter, tolerance=args.tolerance, axis=axis,
            method=args.method,
                        replace_every=args.rr_every,
        )
        solve = partial(_esolve, prob.A)
        backend_used = "distributed:ell-allgather(stream)"
        spmv_bench_make_loop = spmv_bench_tier = None
        if not args.skip_kernel_bench:
            from hpccg_tpu.parallel.cg import make_distributed_spmv_bench

            try:
                spmv_bench_make_loop, spmv_bench_tier = (
                    make_distributed_spmv_bench(mesh, prob.A, axis=axis)
                )
            except (ValueError, TypeError) as e:
                print(
                    f"# distributed kernel bench unavailable: {e}",
                    file=sys.stderr,
                )
                args.skip_kernel_bench = True
    elif file_mode:
        from hpccg_tpu.io import pad_problem_rows, read_hpc_row_structured

        prob, perm, report = read_hpc_row_structured(
            args.dims[0], dtype=dtype, reorder=not args.no_reorder,
        )
        print(f"# matrix structure: {report.format} — {report.reason}", file=sys.stderr)
        file_nrow = prob.total_nrow  # before any --mesh row padding
        nx = ny = nz = 0
        solve = None
        backend_used = None
        if args.mesh > 1:
            # distributed file mode (ref main.cpp:161-179: read_HPC_row ->
            # make_local_matrix -> MPI CG): banded matrices ride the
            # ppermute halo path, unstructured ELL the all-gather path
            from hpccg_tpu.operators import DiaMatrix, EllMatrix
            from hpccg_tpu.parallel import (
                make_distributed_dia_cg,
                make_distributed_ell_cg,
                make_mesh,
            )
            from hpccg_tpu.parallel.cg import shard_problem

            import dataclasses as _dc

            want_collective = args.backend == "collective"
            if want_collective and args.method not in ("cg", "cg1"):
                print(
                    "# the collective DIA kernel implements the cg and cg1 "
                    f"recurrences; ignoring --method {args.method} "
                    "(running cg1)",
                    file=sys.stderr,
                )
                args.method = "cg1"
            elif not want_collective and args.backend != "auto":
                print(
                    "# distributed file mode picks the kernel tier by "
                    f"matrix structure; ignoring --backend {args.backend}",
                    file=sys.stderr,
                )
            mesh, axis = build_mesh()
            from hpccg_tpu.ops.pallas.gell_dynwin import GellDynwinMatrix
            from hpccg_tpu.ops.pallas.gell_kernel import GellMatrix

            from hpccg_tpu.ops.pallas.gell_stack import GellStackMatrix

            # the collective kernel's RDMA strips are whole 128-element
            # rows, so its padding unit is mesh*128; the wide-scatter tiers
            # (stack/dynwin) shard whole 1024-row tiles (identity pad rows
            # — trajectory unchanged, io.pad_problem_rows)
            pad_unit = args.mesh * 128 if want_collective else args.mesh
            if isinstance(prob.A, (GellStackMatrix, GellDynwinMatrix)):
                tier_name = (
                    "stack" if isinstance(prob.A, GellStackMatrix) else "dynwin"
                )
                try:
                    # padding re-preps the operator, whose VMEM gate can
                    # fail at the grown tile count — fall back BEFORE
                    # solving
                    prob = pad_problem_rows(prob, args.mesh * 1024)
                except ValueError as e:
                    from hpccg_tpu.ops.pallas.gell_dynwin import dynwin_to_ell
                    from hpccg_tpu.ops.pallas.gell_stack import stack_to_ell

                    print(
                        f"# {tier_name} tier cannot pad to whole tiles: {e}; "
                        "using the all-gather ELL path",
                        file=sys.stderr,
                    )
                    to_ell = (
                        stack_to_ell
                        if isinstance(prob.A, GellStackMatrix)
                        else dynwin_to_ell
                    )
                    prob = _dc.replace(prob, A=to_ell(prob.A))
                    prob = pad_problem_rows(prob, pad_unit)
            else:
                prob = pad_problem_rows(prob, pad_unit)
            A = prob.A
            L = prob.total_nrow // args.mesh

            if isinstance(A, GellStackMatrix):
                # wide-scatter tier at --mesh > 1: shard the tiles, run the
                # strip kernel per shard on an all-gathered x (round-4
                # known limit closed; the all-gather ELL path remains the
                # fallback when a shard's window exceeds the VMEM budget)
                from hpccg_tpu.ops.pallas.gell_stack import (
                    stack_shard_geometry,
                    stack_to_ell,
                )
                from hpccg_tpu.parallel.cg import make_distributed_stack_cg

                try:
                    stack_shard_geometry(A, args.mesh)
                except ValueError as e:
                    print(
                        f"# stack tier cannot shard: {e}; using the "
                        "all-gather ELL path",
                        file=sys.stderr,
                    )
                    prob = _dc.replace(prob, A=stack_to_ell(A))
                    A = prob.A
                else:
                    _ssolve = make_distributed_stack_cg(
                        mesh, max_iter=args.max_iter,
                        tolerance=args.tolerance, axis=axis,
                        method=args.method,
                        replace_every=args.rr_every,
                    )
                    solve = partial(_ssolve, A)
                    backend_used = "distributed:stack-allgather"
            if isinstance(A, GellDynwinMatrix):
                # wide-scatter dynamic-window tier at --mesh > 1 (round 5):
                # shard the tiles, run the SMEM-window gather per shard on
                # an all-gathered x; all-gather ELL remains the fallback
                from hpccg_tpu.ops.pallas.gell_dynwin import (
                    dynwin_shard_geometry,
                    dynwin_to_ell,
                )
                from hpccg_tpu.parallel.cg import make_distributed_dynwin_cg

                try:
                    dynwin_shard_geometry(A, args.mesh)
                except ValueError as e:
                    print(
                        f"# dynwin tier cannot shard: {e}; using the "
                        "all-gather ELL path",
                        file=sys.stderr,
                    )
                    prob = _dc.replace(prob, A=dynwin_to_ell(A))
                    A = prob.A
                else:
                    _wsolve = make_distributed_dynwin_cg(
                        mesh, max_iter=args.max_iter,
                        tolerance=args.tolerance, axis=axis,
                        method=args.method,
                        replace_every=args.rr_every,
                    )
                    solve = partial(_wsolve, A)
                    backend_used = "distributed:dynwin-allgather"
            if isinstance(A, GellMatrix):
                # scattered-narrow-band tier at --mesh > 1: shard the tiles
                # and ppermute the bandwidth strips into the window padding
                from hpccg_tpu.ops.pallas.gell_kernel import (
                    gell_to_ell,
                    prepare_gell_shards,
                )
                from hpccg_tpu.parallel import make_distributed_gell_cg

                try:
                    shards = prepare_gell_shards(A, args.mesh)
                except ValueError as e:
                    print(
                        f"# {e}; using the all-gather ELL path",
                        file=sys.stderr,
                    )
                    prob = _dc.replace(prob, A=gell_to_ell(A))
                    A = prob.A
                else:
                    _gsolve = make_distributed_gell_cg(
                        mesh, max_iter=args.max_iter,
                        tolerance=args.tolerance, axis=axis,
                        method=args.method,
                        replace_every=args.rr_every,
                    )
                    solve = partial(_gsolve, shards)
                    backend_used = "distributed:gell-halo"
            collective_explained = False
            if want_collective and isinstance(A, DiaMatrix) and solve is None:
                # whole-solve kernel per shard: in-kernel RDMA band-strip
                # halo + in-kernel allreduce (cg1 recurrence — say so)
                from hpccg_tpu.parallel import make_collective_dia_cg
                from hpccg_tpu.parallel.cg import collective_dia_supported

                c_ok, c_reason = collective_dia_supported(
                    A, args.mesh, max_iter=args.max_iter
                )
                if c_ok:
                    rec = (
                        "reference cg recurrence, 2 in-kernel allreduces/iter"
                        if args.method == "cg"
                        else "cg1 single-reduction recurrence"
                    )
                    print(
                        "# backend=collective: whole-solve kernel, in-kernel "
                        f"RDMA halo + allreduce ({rec})",
                        file=sys.stderr,
                    )
                    if args.rr_every:
                        print(
                            "# --rr-every does not apply to the in-kernel "
                            "collective recurrences; ignoring",
                            file=sys.stderr,
                        )
                    _csolve = make_collective_dia_cg(
                        mesh, max_iter=args.max_iter,
                        tolerance=args.tolerance, axis=axis,
                        method=args.method,
                    )
                    solve = partial(_csolve, A)
                    backend_used = "distributed:dia-collective"
                else:
                    collective_explained = True
                    # the fallback tiers honor --method too (round 4:
                    # _method_runner) — say which recurrence actually runs
                    print(
                        f"# collective unavailable: {c_reason}; falling "
                        f"back (the fallback tier runs --method "
                        f"{args.method})",
                        file=sys.stderr,
                    )
            dia_halo_ok = True
            if isinstance(A, DiaMatrix) and solve is None:
                from hpccg_tpu.parallel.cg import dia_halo_plan

                dia_halo_ok, _, dia_reason = dia_halo_plan(A, L)
            if isinstance(A, DiaMatrix) and not dia_halo_ok:
                # band wider than one shard, or too many diagonals for both
                # dia paths: take the general all-gather path instead
                print(
                    f"# {dia_reason}; using the all-gather ELL path",
                    file=sys.stderr,
                )
                prob = _dc.replace(prob, A=A.to_ell())
                A = prob.A
            if isinstance(A, DiaMatrix) and solve is None:
                _dsolve = make_distributed_dia_cg(
                    mesh, max_iter=args.max_iter,
                    tolerance=args.tolerance, axis=axis,
                    method=args.method,
                        replace_every=args.rr_every,
                )
                solve = partial(_dsolve, A)
                backend_used = "distributed:dia-halo"
            elif solve is None:
                prob = shard_problem(prob, mesh, axis=axis)
                _esolve = make_distributed_ell_cg(
                    mesh, max_iter=args.max_iter,
                    tolerance=args.tolerance, axis=axis,
                    method=args.method,
                        replace_every=args.rr_every,
                )
                solve = partial(_esolve, prob.A)
                backend_used = "distributed:ell-allgather"
            if (
                want_collective
                and backend_used != "distributed:dia-collective"
                and not collective_explained
            ):
                print(
                    "# --backend collective applies to banded (DIA) file "
                    f"matrices; this matrix ran {backend_used}",
                    file=sys.stderr,
                )
            spmv_bench_make_loop = spmv_bench_tier = None
            if not args.skip_kernel_bench:
                # per-kernel rows for the Time Summary (round-3 VERDICT #6):
                # bench the distributed tier that actually solves. For the
                # collective whole-solve backend the closest standalone
                # kernel is the dia-halo tier's (the in-kernel-RDMA solve
                # has no dispatchable SpMV); the tier label says what ran.
                from hpccg_tpu.parallel.cg import make_distributed_spmv_bench

                bench_A = (
                    shards
                    if backend_used == "distributed:gell-halo"
                    else prob.A
                )
                try:
                    spmv_bench_make_loop, spmv_bench_tier = (
                        make_distributed_spmv_bench(mesh, bench_A, axis=axis)
                    )
                except (ValueError, TypeError) as e:
                    print(
                        f"# distributed kernel bench unavailable: {e}",
                        file=sys.stderr,
                    )
                    args.skip_kernel_bench = True
    else:
        if len(args.dims) != 3:
            print("error: expected 'nx ny nz' or one data file", file=sys.stderr)
            return 2
        nx, ny, nz = (int(d) for d in args.dims)
        cfg = ProblemConfig(nx, ny, nz, stencil=args.stencil, dtype=dtype)
        if args.mesh > 1:
            from hpccg_tpu.parallel import (
                generate_problem_sharded,
                make_distributed_cg,
                make_mesh,
            )

            mesh, axis = build_mesh()
            prob = generate_problem_sharded(cfg, mesh, axis=axis)
            dist_backend = args.backend
            if dist_backend in ("megakernel", "streamkernel", "ell", "dia"):
                # whole-solve kernels are single-shard-only (no in-kernel
                # collectives yet); ell has its own all_gather entry point
                print(
                    f"# --backend {dist_backend} is not a distributed solver "
                    "backend; using auto",
                    file=sys.stderr,
                )
                dist_backend = "auto"
            from hpccg_tpu.parallel.cg import resolve_distributed_backend

            dist_backend = resolve_distributed_backend(cfg, dist_backend)
            solve = make_distributed_cg(
                cfg,
                mesh,
                max_iter=args.max_iter,
                tolerance=args.tolerance,
                axis=axis,
                backend=dist_backend,
                method=args.method,
                replace_every=args.rr_every,
            )
            backend_used = f"distributed:{dist_backend}"
        else:
            prob = generate_problem(cfg)
            solve = None
            backend_used = None

    if args.refine > 0 and solve is not None:
        # a distributed (or otherwise pre-built) solve ignores --refine; zero
        # it so the reporting path doesn't mislabel CG iterations as
        # refinement rounds
        print(
            "# --refine is a single-device path; ignoring it for this "
            "solve (use --mesh 1)",
            file=sys.stderr,
        )
        args.refine = 0

    if solve is None and args.refine > 0:
        if args.dtype != "float64":
            print("error: --refine requires --dtype float64", file=sys.stderr)
            return 2
        from hpccg_tpu.solver import cg_solve_refined

        backend_used = f"refine({args.backend})"

        def solve(b, x0):  # noqa: F811
            return cg_solve_refined(
                prob.A,
                b,
                x0,
                inner_max_iter=args.max_iter,
                outer_max_iter=args.refine,
                tolerance=args.tolerance,
                backend=args.backend if args.backend != "collective" else "auto",
                method=args.method,
                replace_every=args.rr_every,
            )

    if solve is None:
        if args.backend == "collective":
            print(
                "# --backend collective needs --mesh > 1 (whole-solve kernel "
                "with in-kernel RDMA); using auto",
                file=sys.stderr,
            )
            args.backend = "auto"
        from hpccg_tpu.solver import resolve_backend
        import warnings as _warnings

        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")  # make_cg re-emits any warning
            backend_used = resolve_backend(prob.A, args.backend)
        if backend_used == "auto":
            backend_used = f"native({type(prob.A).__name__})"
        solve = make_cg(
            prob.A,
            max_iter=args.max_iter,
            tolerance=args.tolerance,
            backend=args.backend,
            method=args.method,
            replace_every=args.rr_every,
        )

    if args.dump_matlab:
        from hpccg_tpu.io import dump_matlab

        if args.mesh > 1 and not file_mode:
            # per-shard dumps mat0..mat3, exactly the reference's per-rank
            # files (dump_matlab_matrix.cpp:59-82; ranks > 3 are no-ops).
            # generate_ell(cfg, rank, size) emits each shard's rows WITH the
            # cross-shard z-couplings and global column ids — the clipped
            # local operator would describe a block-diagonal matrix
            from hpccg_tpu.models.stencil import generate_ell

            for r in range(min(args.mesh, 4)):
                shard = generate_ell(cfg, r, args.mesh).A
                path = dump_matlab(args.dump_matlab, shard, rank=r)
                print(f"# wrote {path}", file=sys.stderr)
        elif file_mode:
            # dump in the FILE's basis (ref dump_matlab_matrix reflects the
            # input ordering): unpermute RCM, strip --mesh pad rows
            path = dump_matlab(
                args.dump_matlab, prob.A, perm=perm, true_nrow=file_nrow
            )
            if perm is not None:
                print(
                    "# dump is in the loaded file's original row order "
                    "(RCM solve basis unpermuted)",
                    file=sys.stderr,
                )
            print(f"# wrote {path}", file=sys.stderr)
        else:
            path = dump_matlab(args.dump_matlab, prob.A)
            print(f"# wrote {path}", file=sys.stderr)

    if args.validate:
        if args.mesh <= 1:
            from hpccg_tpu.utils.checks import validate_problem

            findings = validate_problem(prob)
            print(f"# problem validated: {findings}", file=sys.stderr)
        else:
            print(
                "# --validate: pre-solve invariant checks run single-device "
                "only; post-solve finiteness check still applies",
                file=sys.stderr,
            )

    # --- solve (compile excluded from the timed run, like the reference's
    # post-setup chrono window, main.cpp:189-197) ---
    fence(solve(prob.b, prob.x0))
    if args.profile:
        import jax.profiler

        with jax.profiler.trace(args.profile):
            fence(solve(prob.b, prob.x0))
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)
    t0 = time.perf_counter()
    res = solve(prob.b, prob.x0)
    fence(res)
    t_total = time.perf_counter() - t0

    niters = int(res.niters)
    normr = float(res.normr)
    trace = np.asarray(res.trace)

    check_residual = None
    if args.check:
        from hpccg_tpu.ops.vector import compute_residual

        check_residual = float(compute_residual(res.x, prob.xexact))
        print(f"Difference between computed and exact = {check_residual:.6g}")

    if args.validate:
        from hpccg_tpu.utils.checks import check_finite

        check_finite(res)

    if not args.quiet:
        if args.refine > 0:
            print(f"Initial Residual = {trace[0]:.6g}")
            for k in range(1, len(trace)):
                if np.isfinite(trace[k]):
                    print(f"Refinement round = {k}   Residual = {trace[k]:.6g}")
        else:
            # ref HPCCG.cpp:342-344,356,372-373
            print_freq = min(max(args.max_iter // 10, 1), 50)
            print(f"Initial Residual = {trace[0]:.6g}")
            for k in range(1, niters + 1):
                if k % print_freq == 0 or k + 1 == args.max_iter:
                    print(f"Iteration = {k}   Residual = {trace[k]:.6g}")
    print(f"Elapsed time: {t_total:.6g} s", file=sys.stderr)

    # --- FLOP model (main.cpp:217-227) ---
    fniters = float(niters)
    fnrow = float(prob.total_nrow)
    fnnz = float(prob.total_nnz_model)
    fnops_ddot = fniters * 4 * fnrow
    fnops_waxpby = fniters * 6 * fnrow
    fnops_sparsemv = fniters * 2 * fnnz
    fnops = fnops_ddot + fnops_waxpby + fnops_sparsemv

    # --- per-kernel micro-benchmarks for the Time Summary ---
    # Per-kernel times via amortized in-jit loops (dispatch latency would
    # otherwise dominate ms-scale kernels). waxpby chains naturally
    # (w <- x + 0.5w); ddot is measured differentially from a fused
    # waxpby+ddot loop; spmv chains with a 1/54 rescale to avoid overflow.
    t_ddot = t_waxpby = t_spmv = float("nan")
    if not args.skip_kernel_bench:
        from hpccg_tpu.utils.timing import time_loop_body

        x_in = prob.b

        def wax_body(w):
            return waxpby_op(1.0, x_in, 0.5, w)

        def combo_body(c):
            w, s = c
            w = waxpby_op(1.0, x_in, 0.5, w)
            return w, s + jnp.vdot(w, w)

        t_wax1 = time_loop_body(wax_body, prob.x0)
        t_combo = time_loop_body(combo_body, (prob.x0, jnp.zeros((), dtype)))
        t_ddot1 = max(t_combo - t_wax1, 0.0)

        if args.mesh > 1 and file_mode:
            # the distributed file-mode tier's per-shard kernel (built above
            # by make_distributed_spmv_bench; exchange cost is separate, as
            # in the reference's times[5])
            from hpccg_tpu.utils.timing import time_loop_slope

            slow_gather = (
                spmv_bench_tier == "ell-allgather"
                and prob.total_nrow >= 100_000
            )
            t_spmv1 = time_loop_slope(
                spmv_bench_make_loop,
                prob.x0,
                # the all-gather path at scale runs ~0.14 Gnnz/s — shrink
                # the slope legs so the bench does not dwarf the solve
                iters=2 if slow_gather else 64,
                spread=8 if slow_gather else 64,
            )
        elif args.mesh > 1:
            from jax.sharding import PartitionSpec as P

            from hpccg_tpu.parallel.cg import local_operator
            from hpccg_tpu.parallel.halo import stencil_matvec_halo

            op_local = local_operator(cfg)

            from hpccg_tpu.utils.timing import time_loop_slope

            if backend_used in ("distributed:pallas", "distributed:pallas_dd"):
                # bench the tier the solve actually ran (round-2 weak #2):
                # the overlapped pallas-v2 halo matvec in the padded layout
                # (dd = the double-float kernel for f64 shards, round 3)
                from hpccg_tpu.ops.pallas.stencil_v2 import (
                    pad_plane3,
                    unpad_plane3,
                )
                from hpccg_tpu.parallel.halo import (
                    stencil_matvec_halo_pallas_v2_overlap,
                )

                _dd = backend_used == "distributed:pallas_dd"

                def make_spmv_loop(k):
                    def f(v):
                        u = pad_plane3(op_local, v)
                        u = jax.lax.fori_loop(
                            0,
                            k,
                            lambda i, c: stencil_matvec_halo_pallas_v2_overlap(
                                op_local, c, axis, dd=_dd
                            )
                            * (1.0 / 54.0),
                            u,
                        )
                        return unpad_plane3(op_local, u)

                    return jax.jit(
                        jax.shard_map(
                            f,
                            mesh=mesh,
                            in_specs=P(axis),
                            out_specs=P(axis),
                            check_vma=False,
                        )
                    )

            else:

                def spmv_once(v):
                    return stencil_matvec_halo(op_local, v, axis) * (1.0 / 54.0)

                def make_spmv_loop(k):
                    return jax.jit(
                        jax.shard_map(
                            lambda v: jax.lax.fori_loop(0, k, lambda i, c: spmv_once(c), v),
                            mesh=mesh,
                            in_specs=P(axis),
                            out_specs=P(axis),
                        )
                    )

            t_spmv1 = time_loop_slope(make_spmv_loop, prob.x0)
        elif backend_used == "pallas_dd":
            # bench the tier that solved (round-2 weak #2): the f64 solve
            # ran the double-float stencil kernel in the padded layout, so
            # pad once outside the timed loop like the solve does
            from hpccg_tpu.ops.pallas.stencil_v2 import (
                pad_plane3,
                spmv_padded_v2_dd,
                unpad_plane3,
            )
            from hpccg_tpu.utils.timing import time_loop_slope

            def make_dd_loop(k):
                def f(v):
                    u = pad_plane3(prob.A, v)
                    u = jax.lax.fori_loop(
                        0,
                        k,
                        lambda i, c: spmv_padded_v2_dd(prob.A, c) * (1.0 / 54.0),
                        u,
                    )
                    return unpad_plane3(prob.A, u)

                return jax.jit(f)

            t_spmv1 = time_loop_slope(make_dd_loop, prob.x0)
        else:
            t_spmv1 = time_loop_body(
                # whole-solve backends (megakernel/streamkernel/...) have no
                # standalone SpMV; bench the dispatchable kernel tier
                lambda v: spmv(
                    prob.A,
                    v,
                    backend=args.backend
                    if args.backend in ("stencil", "ell", "dia", "pallas")
                    else "auto",
                )
                * (1.0 / 54.0),
                prob.x0,
            )
        t_ddot = t_ddot1 * 2 * fniters
        t_waxpby = t_wax1 * 3 * fniters
        t_spmv = t_spmv1 * fniters

    # --- report (main.cpp:230-304 schema) ---
    doc = Report("hpccg-tpu", "1.0")
    par = doc.add("Parallelism")
    ndev = args.mesh
    par.add("Number of mesh devices", ndev)
    par.add(
        "Mesh axes",
        ("(single device)" if ndev <= 1
         else repr(tuple(mesh.axis_names)) if mesh2d_shape is not None
         else "z"),
    )
    par.add("Device kind", getattr(jax.devices()[0], "device_kind", "unknown"))
    par.add("Platform", jax.default_backend())
    par.add("MPI not enabled (ICI/DCN collectives via XLA)", "")

    dims = doc.add("Dimensions")
    dims.add("nx", nx)
    dims.add("ny", ny)
    dims.add("nz", nz)
    if ndev > 1:
        dims.add("global nz", nz * ndev)
    dims.add("stencil", args.stencil)
    dims.add("dtype", args.dtype)

    doc.add("Number of iterations", niters)
    doc.add("Final residual", normr)
    if check_residual is not None:
        doc.add("Difference between computed and exact", check_residual)
    doc.add("#********** Performance Summary (times in sec) ***********", "")

    ts = doc.add("Time Summary")
    ts.add("Total   ", t_total)
    ts.add("DDOT    ", t_ddot)
    ts.add("WAXPBY  ", t_waxpby)
    ts.add("SPARSEMV", t_spmv)
    bench_tier_note = (
        f" (SPARSEMV row benches the {spmv_bench_tier} per-shard kernel)"
        if file_mode and args.mesh > 1 and not args.skip_kernel_bench
        else ""
    )
    ts.add(
        f"(DDOT/WAXPBY/SPARSEMV are phase-separated micro-benchmarks of the "
        f"dispatchable kernel tier; Total timed backend={backend_used or args.backend} "
        f"— for fused/whole-solve backends the kernel rows are NOT components of Total"
        f"{bench_tier_note})",
        "",
    )

    fl = doc.add("FLOPS Summary")
    fl.add("Total   ", fnops)
    fl.add("DDOT    ", fnops_ddot)
    fl.add("WAXPBY  ", fnops_waxpby)
    fl.add("SPARSEMV", fnops_sparsemv)

    def mflops(ops: float, t: float) -> float:
        # t == 0 means "below timer resolution"; C++ prints inf (out.txt:33-37)
        if t != t:  # skipped bench -> NaN
            return float("nan")
        return ops / t / 1e6 if t > 0 else float("inf")

    mf = doc.add("MFLOPS Summary")
    mf.add("Total   ", mflops(fnops, t_total))
    mf.add("DDOT    ", mflops(fnops_ddot, t_ddot))
    mf.add("WAXPBY  ", mflops(fnops_waxpby, t_waxpby))
    mf.add("SPARSEMV", mflops(fnops_sparsemv, t_spmv))

    if ndev > 1 and not args.skip_kernel_bench:
        # distributed overheads (analog of main.cpp:284-299)
        from jax.sharding import PartitionSpec as P

        # allreduce latency, slope-timed in-jit (the carry feeds each psum)
        from hpccg_tpu.utils.timing import time_loop_slope

        def make_psum_loop(k):
            # pcast re-varies the psum'd carry so the fori_loop carry types
            # match on multi-axis meshes (psum over the full tuple makes the
            # scalar invariant, but the initial vdot is varying)
            def loop(v):
                s = jax.lax.fori_loop(
                    0,
                    k,
                    lambda i, s: jax.lax.pcast(
                        jax.lax.psum(s, axis) * (1.0 / ndev),
                        axis,
                        to="varying",
                    ),
                    jnp.vdot(v, v),
                )
                # one final psum makes the P() output invariant again
                return jax.lax.psum(s, axis) * (1.0 / ndev)

            return jax.jit(
                jax.shard_map(loop, mesh=mesh, in_specs=P(axis), out_specs=P())
            )

        t_psum = time_loop_slope(make_psum_loop, prob.b) * 2 * fniters
        # ref main.cpp:201-210,285-288 reports min/max/avg of the ddot MPI
        # time across ranks. XLA mesh collectives complete in lockstep (one
        # fused program, every device leaves the psum together), so the
        # cross-device spread the MPI build measures is structurally zero —
        # report the same schema keys with that one value, and say why.
        dv = doc.add("DDOT Timing Variations")
        dv.add("Min DDOT MPI_Allreduce time", t_psum)
        dv.add("Max DDOT MPI_Allreduce time", t_psum)
        dv.add("Avg DDOT MPI_Allreduce time", t_psum)
        dv.add("(XLA psum is lockstep across the mesh: min == max == avg)", "")
        ov = doc.add("SPARSEMV OVERHEADS")
        ov.add("SPARSEMV MFLOPS W OVERHEAD", fnops_sparsemv / t_spmv / 1e6)
        ov.add("SPARSEMV PARALLEL OVERHEAD note", "halo exchange is fused into the SpMV (ppermute)")

    if jax.process_index() == 0:
        print(doc.to_json() if args.json else doc.generate_yaml(), end="")
    if args.report_file:
        path = doc.write(fmt="json" if args.json else "yaml")
        print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
