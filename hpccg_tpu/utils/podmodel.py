"""Analytic pod-scale per-iteration cost model (round-3 VERDICT #5).

With one physical chip, multi-chip PERFORMANCE cannot be measured — but it
can be PREDICTED from measured single-chip kernel time plus published
interconnect characteristics, turning BASELINE.json's ">= 85% weak-scaling
efficiency at N hosts" from an unaddressed metric into a stated, falsifiable
prediction a future pod run can check (the first real pod run then has a
number to validate against).

Cost shape per CG iteration on an N-chip z-line (SURVEY.md §3.2):

    t_iter = t_compute                      (measured, single shard)
           + n_reduce * t_allreduce(N)      (2 for cg, 1 for cg1)
           + t_halo_exposed                 (0 when overlap hides it)

- t_allreduce: a scalar (latency-bound) reduction — modeled as a
  recursive-doubling tree, 2*ceil(log2 N) ICI hops within one ICI domain
  (a v5e pod is a single 2-D-torus ICI domain up to 256 chips; DCN
  appears only across pods/slices), plus one DCN round per tree level
  that crosses domains. This matches both XLA's psum lowering shape and
  the collective kernels' in-kernel butterfly
  (ops/pallas/collective_kernel.py).
- t_halo: one nx*ny boundary plane each way per iteration. Every
  distributed tier runs its kernel on a zero halo with boundary
  corrections (jaxpr-verified overlap, parallel/halo.py), so the
  exchange is exposed only when it outlasts the interior compute:
  t_halo_exposed = max(0, t_halo - overlap_credit * t_compute).

Interconnect parameters are STATED ASSUMPTIONS from public TPU v5e
figures (Google Cloud TPU docs: 1600 Gbps aggregate ICI per chip over 4
links => ~50 GB/s per link per direction; DCN per host ~ 25 GB/s with
tens-of-microseconds latency). They are dataclass fields precisely so a
pod run can calibrate them.

The model's headline (and falsifiable) prediction: at the reference
weak-scaling protocol's 64^3-per-rank block, a TPU iteration is so fast
(~10 us) that the 2-allreduce cg recurrence is LATENCY-bound at pod
scale — >= 85% weak efficiency needs either the communication-hiding
pipecg/cg1 methods or bigger per-chip blocks. That is exactly why the
single-reduction and pipelined collective kernels exist.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class PodModelParams:
    """Stated interconnect assumptions (public v5e figures; calibrate on a
    real pod)."""

    ici_bw: float = 5.0e10  # B/s per link per direction (~1600 Gbps / 4 links)
    ici_hop_latency: float = 1.0e-6  # s per ICI hop (order-of-magnitude)
    dcn_bw: float = 2.5e10  # B/s per slice boundary
    dcn_latency: float = 25.0e-6  # s per DCN round
    overlap_credit: float = 0.5  # fraction of t_compute available to hide halo
    ici_domain: int = 256  # chips per ICI domain (one v5e pod)


def predict_iteration(
    t_compute_s: float,
    *,
    nx: int,
    ny: int,
    itemsize: int,
    ndev: int,
    method: str = "cg",
    params: PodModelParams = PodModelParams(),
) -> dict:
    """Predicted per-iteration wall time and its terms for an ndev-chip
    z-line holding the measured single-shard compute time ``t_compute_s``.

    ndev > params.ici_domain spans multiple pods: the slice boundaries and
    the allreduce's top tree levels pay DCN cost.
    """
    if ndev <= 1:
        return {
            "ndev": ndev,
            "method": method,
            "t_iter_us": t_compute_s * 1e6,
            "t_compute_us": t_compute_s * 1e6,
            "t_allreduce_us": 0.0,
            "t_halo_exposed_us": 0.0,
            "weak_efficiency": 1.0,
        }
    n_reduce = 1 if method in ("cg1", "pipecg") else 2
    plane = nx * ny * itemsize
    pods = max(1, -(-ndev // params.ici_domain))

    # scalar allreduce: recursive-doubling tree over the line — each of the
    # ceil(log2 N) rounds is a send + a wait (2 hops of latency); the top
    # tree levels that cross pod boundaries ride DCN instead
    rounds = max(1, math.ceil(math.log2(ndev)))
    dcn_rounds = min(rounds, max(0, math.ceil(math.log2(pods)))) if pods > 1 else 0
    ici_rounds = rounds - dcn_rounds
    t_allreduce = (
        ici_rounds * 2 * params.ici_hop_latency + dcn_rounds * params.dcn_latency
    )

    # halo: up+down plane exchange, concurrent directions; the worst shard
    # pays one plane over its slowest link (DCN at a pod boundary)
    t_halo_ici = params.ici_hop_latency + plane / params.ici_bw
    t_halo = (
        max(t_halo_ici, params.dcn_latency + plane / params.dcn_bw)
        if pods > 1
        else t_halo_ici
    )
    # pipecg additionally overlaps the allreduce with the SpMV
    t_red_exposed = (
        max(0.0, n_reduce * t_allreduce - params.overlap_credit * t_compute_s)
        if method == "pipecg"
        else n_reduce * t_allreduce
    )
    t_halo_exposed = max(0.0, t_halo - params.overlap_credit * t_compute_s)
    t_iter = t_compute_s + t_red_exposed + t_halo_exposed
    return {
        "ndev": ndev,
        "pods": pods,
        "method": method,
        "t_iter_us": round(t_iter * 1e6, 3),
        "t_compute_us": round(t_compute_s * 1e6, 3),
        "t_allreduce_us": round(t_red_exposed * 1e6, 3),
        "t_halo_exposed_us": round(t_halo_exposed * 1e6, 3),
        # weak scaling: per-chip work fixed, so efficiency = t_compute/t_iter
        "weak_efficiency": round(t_compute_s / t_iter, 4),
    }


def predict_weak_scaling(
    t_compute_s: float,
    *,
    nx: int,
    ny: int,
    itemsize: int,
    meshes=(4, 8, 16, 64, 256),
    methods=("cg", "cg1", "pipecg"),
    params: PodModelParams = PodModelParams(),
) -> list:
    """Pod predictions for a weak-scaling sweep (fixed per-chip block):
    one row per (mesh size, method) — cg1/pipecg are the framework's
    communication-reduced answers when the cg rows go latency-bound."""
    return [
        predict_iteration(
            t_compute_s,
            nx=nx,
            ny=ny,
            itemsize=itemsize,
            ndev=nd,
            method=m,
            params=params,
        )
        for nd in meshes
        for m in methods
    ]


def predict_strong_scaling(
    t_compute_1_s: float,
    *,
    nx: int,
    ny: int,
    itemsize: int,
    meshes=(4, 8, 16, 64, 256),
    methods=("cg", "cg1", "pipecg"),
    params: PodModelParams = PodModelParams(),
) -> list:
    """Pod predictions for the reference STRONG-scaling protocol
    (strongScalingRunScript:6-12 — fixed global domain, nz divided across
    ranks): per-shard compute is modeled as t_compute_1 / N (the kernels
    are bandwidth-bound, so time ~ local rows — optimistic once a shard
    shrinks into the VMEM-resident regime, stated here rather than
    hidden), while the exchanged nx*ny halo plane and the allreduce
    latency do NOT shrink — the classic strong-scaling wall the model
    makes explicit. strong_efficiency = t_iter(1) / (N * t_iter(N))."""
    rows = []
    for nd in meshes:
        for m in methods:
            r = predict_iteration(
                t_compute_1_s / nd,
                nx=nx,
                ny=ny,
                itemsize=itemsize,
                ndev=nd,
                method=m,
                params=params,
            )
            r.pop("weak_efficiency", None)
            r["strong_efficiency"] = round(
                t_compute_1_s / (nd * r["t_iter_us"] * 1e-6), 4
            )
            rows.append(r)
    return rows
