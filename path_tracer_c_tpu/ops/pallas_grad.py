"""Hand-written Pallas backward kernel for the path-trace estimator.

Reverse-mode through the XLA core integrator is HBM-bound (it materializes
per-bounce rays-x-objects intermediates) and ~100x slower than the Pallas
forward. This kernel computes the exact same VJP at megakernel speed by
exploiting the estimator's structure (see grad/diff.py):

per sample, radiance is ``total[c] = sum_b P_b[c] * E_b[c] +
P_end[c] * sky[c]`` where ``P_b`` is the prefix product of
``albedo * ratio`` along the path and ``E_b`` is the bounce's emission
(or sky on a miss). All *continuous* scene dependence lives in the
albedo/emission/transparency/sky factors — material indices, hit
distances, normals and directions enter only through discrete events, so
their cotangents are exactly zero (the AD tests pin this down). The VJP
therefore reduces to prefix/suffix product sweeps:

1. **Replay** the forward path (identical RNG counters), storing per
   bounce in VMEM: the prefix throughput ``P_b``, the material index, and
   the hit / miss / TIR-death / refract-choice masks.
2. **Suffix sweep** b = B..0 with the carry ``T_b[c]`` = cotangent of the
   throughput *after* bounce b's multiply:
   ``T_{b-1} = Le_b + albedo_b * T_b`` on surviving lanes, ``0`` after a
   TIR death, ``sky`` at a miss; per bounce accumulate
   ``d_albedo[m_b] += g * P_b * T_b``, ``d_eco[m_b] += g * P_b * est``,
   ``d_est[m_b] += sum_c g * P_b * eco``, ``d_sky += g * P_b`` (miss),
   and the transparency term through the ratio reparameterization.

Per-material accumulation uses (M, 3, TH, TW) VMEM planes (masked adds in
an M-loop — no gathers), reduced to scalars once per tile and summed
across grid programs into a single (M, 8)+sky output block.

Supports the default "gpu" variant, with or without anti-aliasing jitter
and row-block sharding (``row_start``/``rows``); the "cpu" tier (whose
per-sample clamp breaks the product structure) falls back to core-path AD.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from ..ops.camera import Camera
from . import pallas_kernels as fk

__all__ = ["render_pallas_bwd", "BWD_TILE"]

# Tile sweep on v5e (1024^2/16spp/8bounce glossy, Grays/s): (8,128) 0.54,
# (16,128) 0.94, (32,128) 1.27, (64,128) 1.32, (32,256) 1.31, (8,512)
# 1.24. Unlike the forward, bigger tiles keep winning: the replay's
# per-bounce stores live in VMEM scratch (not loop-carried vregs), so
# large tiles amortize the suffix sweep's per-material accumulator loop
# instead of spilling. (64,128) is past the knee; VMEM scratch there is
# ~4 MB of the ~16 MB budget at 8 bounces.
BWD_TILE = (64, 128)


def _bwd_kernel(
    sph_c, sph_r, sph_m, sph_a,
    tri_v0, tri_v1, tri_v2, tri_n, tri_m, tri_a,
    m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
    par_f, par_i,
    g_ref,  # (3, TH, TW) cotangent of the radiance image (mean over spp)
    out_ref,  # (M+1, 8) accumulated cotangents; row M = sky (cols 0..2)
    # scratch
    p_store,  # (B+1, 3, TH, TW) prefix throughput at Le time
    mk_store,  # (B+1, 4, TH, TW) masks: hit, miss, tir, refr (f32 0/1)
    mat_store,  # (B+1, TH, TW) i32 material index
    acc,  # (M, 8, TH, TW) per-material cotangent planes
    sky_acc,  # (3, TH, TW)
    *,
    th, tw, n_sph, n_tri, n_mat, spp, max_bounces, jitter,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    first = (ti == 0) & (tj == 0)

    tan2 = par_f[0, 0]
    aspect = par_f[0, 1]
    width = par_f[0, 2]
    height = par_f[0, 3]
    sky_r, sky_g, sky_b = par_f[0, 4], par_f[0, 5], par_f[0, 6]
    cox, coy, coz = par_f[0, 7], par_f[0, 8], par_f[0, 9]
    crx, cry, crz = par_f[0, 10], par_f[0, 11], par_f[0, 12]
    cux, cuy, cuz = par_f[0, 13], par_f[0, 14], par_f[0, 15]
    cfx, cfy, cfz = par_f[0, 16], par_f[0, 17], par_f[0, 18]
    seed = par_i[0, 0].astype(jnp.uint32)
    sample_offset = par_i[0, 1]
    row_start = par_i[0, 2]  # global row of this kernel's first row (sharding)

    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ti * th + row_start
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tj * tw
    pix = (rows * width.astype(jnp.int32) + cols).astype(jnp.uint32)

    x = (cols.astype(jnp.float32) + 0.5) / width * 2.0 - 1.0
    y = -((rows.astype(jnp.float32) + 0.5) / height * 2.0 - 1.0)
    dcx = x * tan2
    dcy = y * tan2 / aspect
    pdx = dcx * crx + dcy * cux + cfx
    pdy = dcx * cry + dcy * cuy + cfy
    pdz = dcx * crz + dcy * cuz + cfz
    pn = jax.lax.rsqrt(pdx * pdx + pdy * pdy + pdz * pdz)
    pdx, pdy, pdz = pdx * pn, pdy * pn, pdz * pn

    zero = jnp.zeros((th, tw), jnp.float32)
    ones = jnp.ones((th, tw), jnp.float32)

    # The incoming cotangent is for the spp-mean image.
    inv_spp = jnp.float32(1.0 / spp)
    g_r = g_ref[0] * inv_spp
    g_g = g_ref[1] * inv_spp
    g_b = g_ref[2] * inv_spp

    # zero the per-tile accumulators
    for c in range(3):
        sky_acc[c] = zero
    def zero_acc(mi, _):
        for k in range(8):
            acc[mi, k] = zero
        return 0
    jax.lax.fori_loop(0, n_mat, zero_acc, 0)

    closest_hit, _, _ = fk.make_geometry(
        sph_c, sph_r, sph_m, sph_a, tri_v0, tri_v1, tri_v2, tri_n, tri_m,
        tri_a, m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
        (sky_r, sky_g, sky_b), th, tw, n_sph, n_tri, n_mat,
    )

    hit0 = None if jitter else closest_hit(
        jnp.full((th, tw), cox), jnp.full((th, tw), coy),
        jnp.full((th, tw), coz), pdx, pdy, pdz,
    )

    def sample_body(s, carry):
        sample = (s + sample_offset).astype(jnp.uint32)
        st = (
            pix * fk._u32(0x9E3779B9)
            ^ sample * fk._u32(0x85EBCA6B)
            ^ seed * fk._u32(0xC2B2AE35)
        )
        st, _ = fk._pcg(st)
        st, _ = fk._pcg(st)

        if jitter:
            # Anti-aliasing replay: same 2 draws + draw order as
            # primary_rays(jitter_state) (ops/camera.py:123-131).
            st, jx = fk._uniform(st)
            st, jy = fk._uniform(st)
            xj = (cols.astype(jnp.float32) + jx) / width * 2.0 - 1.0
            yj = -((rows.astype(jnp.float32) + jy) / height * 2.0 - 1.0)
            djx = xj * tan2
            djy = yj * tan2 / aspect
            sdx = djx * crx + djy * cux + cfx
            sdy = djx * cry + djy * cuy + cfy
            sdz = djx * crz + djy * cuz + cfz
            sn = jax.lax.rsqrt(sdx * sdx + sdy * sdy + sdz * sdz)
            sdx, sdy, sdz = sdx * sn, sdy * sn, sdz * sn
        else:
            sdx, sdy, sdz = pdx, pdy, pdz

        # ---- replay forward, storing per-bounce data ----
        def fwd_body(b, fc):
            # Dead lanes replay garbage, but every contribution their
            # garbage could make to the accumulators is multiplied by the
            # stored prefix P == 0, and the suffix sweep's carry for a
            # dead lane is re-anchored at the bounce where the real death
            # event is stored, so later corruption never propagates past
            # it. Unlike the forward kernel, the replay CANNOT terminate
            # on zero throughput: a lane killed by an exactly-zero albedo
            # has P == 0 downstream yet its albedo cotangent g*P_b*T_b
            # needs T_b built from the *untraced future* path, so the
            # replay tracks structural deaths (miss / TIR) in a separate
            # ``done`` plane (f32 0/1 — Mosaic can't carry i1 vectors) and
            # only those end it.
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, rng, done) = fc
            if jitter:
                # per-sample primary rays: nothing to hoist
                bt, nx, ny, nz, mat = closest_hit(ox, oy, oz, dx, dy, dz)
            else:
                bt, nx, ny, nz, mat = jax.lax.cond(
                    b == 0,
                    lambda: hit0,
                    lambda: closest_hit(ox, oy, oz, dx, dy, dz),
                )
            hitmask = bt < fk._INF

            p_store[b, 0] = tr
            p_store[b, 1] = tg
            p_store[b, 2] = tb
            mat_store[b] = mat

            # material fetch (albedo, roughness, transparency, ior)
            alb_r = zero; alb_g = zero; alb_b = zero
            rgh = zero; trn = zero
            ior = ones

            def mat_body(mi, c):
                ar_, ag_, ab_, rg_, tn_, io_ = c
                msk = mat == mi
                return (
                    jnp.where(msk, m_alb[mi, 0], ar_),
                    jnp.where(msk, m_alb[mi, 1], ag_),
                    jnp.where(msk, m_alb[mi, 2], ab_),
                    jnp.where(msk, m_rgh[mi, 0], rg_),
                    jnp.where(msk, m_trn[mi, 0], tn_),
                    jnp.where(msk, m_ior[mi, 0], io_),
                )

            alb_r, alb_g, alb_b, rgh, trn, ior = jax.lax.fori_loop(
                0, n_mat, mat_body, (alb_r, alb_g, alb_b, rgh, trn, ior)
            )

            tr = jnp.where(hitmask, tr * alb_r, 0.0)
            tg = jnp.where(hitmask, tg * alb_g, 0.0)
            tb = jnp.where(hitmask, tb * alb_b, 0.0)

            rng, (sx_, sy_, sz_) = fk._unit_sphere(rng)
            rng, u_branch = fk._uniform(rng)

            wnx = nx + rgh * sx_
            wny = ny + rgh * sy_
            wnz = nz + rgh * sz_
            wn = jax.lax.rsqrt(
                jnp.maximum(wnx * wnx + wny * wny + wnz * wnz, 1e-20)
            )
            wnx, wny, wnz = wnx * wn, wny * wn, wnz * wn

            ndot = dx * wnx + dy * wny + dz * wnz
            rfx = dx - 2.0 * ndot * wnx
            rfy = dy - 2.0 * ndot * wny
            rfz = dz - 2.0 * ndot * wnz
            entering = ndot < 0.0
            eta = jnp.where(entering, 1.0 / ior, ior)
            rnx = jnp.where(entering, wnx, -wnx)
            rny = jnp.where(entering, wny, -wny)
            rnz = jnp.where(entering, wnz, -wnz)
            ni = rnx * dx + rny * dy + rnz * dz
            k = 1.0 - eta * eta * (1.0 - ni * ni)
            tirm = k < 0.0
            # matches ops/sampling.refract's guarded sqrt (see there)
            ksafe = jnp.where(tirm, 1.0, jnp.maximum(k, 1e-12))
            coef = eta * ni + jnp.sqrt(ksafe)
            txx = jnp.where(tirm, 0.0, eta * dx - coef * rnx)
            txy = jnp.where(tirm, 0.0, eta * dy - coef * rny)
            txz = jnp.where(tirm, 0.0, eta * dz - coef * rnz)

            choose_refr = u_branch < trn
            ndx = jnp.where(choose_refr, txx, rfx)
            ndy = jnp.where(choose_refr, txy, rfy)
            ndz = jnp.where(choose_refr, txz, rfz)
            died = choose_refr & tirm

            # Dead lanes store garbage events here, but the sweep multiplies
            # every accumulator contribution by their stored P == 0 and
            # re-anchors the carry at the real death event (see fwd_body
            # docstring), so un-gated stores are exact.
            mk_store[b, 0] = jnp.where(hitmask, 1.0, 0.0)
            mk_store[b, 1] = jnp.where(hitmask, 0.0, 1.0)
            mk_store[b, 2] = jnp.where(died & hitmask, 1.0, 0.0)
            mk_store[b, 3] = jnp.where(choose_refr, 1.0, 0.0)

            # Structural death this bounce: miss or TIR. Zero albedo is
            # NOT a death for the replay (see fwd_body docstring).
            done = jnp.maximum(done, jnp.where(hitmask & ~died, 0.0, 1.0))

            tr = jnp.where(died, 0.0, tr)
            tg = jnp.where(died, 0.0, tg)
            tb = jnp.where(died, 0.0, tb)
            ndx = jnp.where(died, dx, ndx)
            ndy = jnp.where(died, dy, ndy)
            ndz = jnp.where(died, dz, ndz)

            px = ox + jnp.where(hitmask, bt, 0.0) * dx
            py = oy + jnp.where(hitmask, bt, 0.0) * dy
            pz = oz + jnp.where(hitmask, bt, 0.0) * dz
            offs = fk.DEFAULT_EPS_OFFSET + fk.EPS_OFFSET_SCALE * jnp.sqrt(
                px * px + py * py + pz * pz
            )
            side = jnp.where(ndx * nx + ndy * ny + ndz * nz >= 0.0, 1.0, -1.0)
            return (px + offs * side * nx, py + offs * side * ny,
                    pz + offs * side * nz, ndx, ndy, ndz, tr, tg, tb, rng,
                    done)

        # Pre-zero the per-bounce masks so bounces skipped by the early
        # exit read as "no event" in the suffix sweep.
        def zero_masks(b, _):
            for k in range(4):
                mk_store[b, k] = zero
            return 0

        jax.lax.fori_loop(0, max_bounces + 1, zero_masks, 0)

        fc0 = (
            jnp.full((th, tw), cox), jnp.full((th, tw), coy),
            jnp.full((th, tw), coz), sdx, sdy, sdz,
            ones, ones, ones, st, zero,
        )

        # Early exit only once every lane has a *structural* death event
        # (miss/TIR) on record — zero-throughput lanes keep replaying so
        # the suffix carry they need is built (ADVICE r1: black-albedo
        # gradients were ~2x wrong under the throughput-based exit).
        def w_cond(c):
            b, fc = c
            return (b < max_bounces + 1) & (jnp.min(fc[10]) < 1.0)

        def w_body(c):
            b, fc = c
            return b + 1, fwd_body(b, fc)

        _, fc = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), fc0))
        (_, _, _, _, _, _, tr_e, tg_e, tb_e, _, _) = fc

        # exhausted lanes: total += P_end * sky -> d_sky += g * P_end
        # (dead lanes carry P == 0, so no mask is needed)
        sky_acc[0] = sky_acc[0] + g_r * tr_e
        sky_acc[1] = sky_acc[1] + g_g * tg_e
        sky_acc[2] = sky_acc[2] + g_b * tb_e

        # ---- suffix sweep ----
        def bwd_body(i, T):
            b = max_bounces - i
            Tr, Tg, Tb = T
            hitm = mk_store[b, 0] > 0.0
            missm = mk_store[b, 1] > 0.0
            tirm = mk_store[b, 2] > 0.0
            refrm = mk_store[b, 3] > 0.0
            mat = mat_store[b]
            Pr = p_store[b, 0]
            Pg = p_store[b, 1]
            Pb_ = p_store[b, 2]

            # TIR lanes have no downstream throughput cotangent.
            Tr_h = jnp.where(tirm, 0.0, Tr)
            Tg_h = jnp.where(tirm, 0.0, Tg)
            Tb_h = jnp.where(tirm, 0.0, Tb)

            # d_sky from misses at this bounce.
            sky_acc[0] = sky_acc[0] + jnp.where(missm, g_r * Pr, 0.0)
            sky_acc[1] = sky_acc[1] + jnp.where(missm, g_g * Pg, 0.0)
            sky_acc[2] = sky_acc[2] + jnp.where(missm, g_b * Pb_, 0.0)

            # per-lane cotangent pieces (hit lanes only)
            cAr = jnp.where(hitm, g_r * Pr * Tr_h, 0.0)
            cAg = jnp.where(hitm, g_g * Pg * Tg_h, 0.0)
            cAb = jnp.where(hitm, g_b * Pb_ * Tb_h, 0.0)
            gPr = jnp.where(hitm, g_r * Pr, 0.0)
            gPg = jnp.where(hitm, g_g * Pg, 0.0)
            gPb = jnp.where(hitm, g_b * Pb_, 0.0)

            # accumulate per material and build the carry pieces
            def mat_body(mi, c):
                Lr, Lg, Lb, Ar, Ag, Ab, Tn = c
                msk = mat == mi
                alr, alg, alb_ = m_alb[mi, 0], m_alb[mi, 1], m_alb[mi, 2]
                ecr, ecg, ecb = m_eco[mi, 0], m_eco[mi, 1], m_eco[mi, 2]
                es = m_est[mi, 0]
                tn = m_trn[mi, 0]
                mskf = jnp.where(msk & hitm, 1.0, 0.0)
                # albedo cotangent
                acc[mi, 0] = acc[mi, 0] + mskf * cAr
                acc[mi, 1] = acc[mi, 1] + mskf * cAg
                acc[mi, 2] = acc[mi, 2] + mskf * cAb
                # emission color / strength cotangents (E_b = eco * est)
                acc[mi, 3] = acc[mi, 3] + mskf * gPr * es
                acc[mi, 4] = acc[mi, 4] + mskf * gPg * es
                acc[mi, 5] = acc[mi, 5] + mskf * gPb * es
                acc[mi, 6] = acc[mi, 6] + mskf * (
                    gPr * ecr + gPg * ecg + gPb * ecb
                )
                # transparency via the ratio reparameterization
                cot_ratio = cAr * alr + cAg * alg + cAb * alb_
                dr = jnp.where(
                    refrm,
                    1.0 / jnp.maximum(tn, 1e-6),
                    -1.0 / jnp.maximum(1.0 - tn, 1e-6),
                )
                acc[mi, 7] = acc[mi, 7] + mskf * cot_ratio * dr
                # carry pieces: Le_b and albedo_b selected per lane
                return (
                    jnp.where(msk, ecr * es, Lr),
                    jnp.where(msk, ecg * es, Lg),
                    jnp.where(msk, ecb * es, Lb),
                    jnp.where(msk, alr, Ar),
                    jnp.where(msk, alg, Ag),
                    jnp.where(msk, alb_, Ab),
                    jnp.where(msk, tn, Tn),
                )

            Lr, Lg, Lb, Ar, Ag, Ab, _ = jax.lax.fori_loop(
                0, n_mat, mat_body,
                (zero, zero, zero, zero, zero, zero, zero),
            )

            # carry: T_{b-1} = Le_b + albedo_b * T_b (hit), sky (miss),
            # pass-through (lane already dead — value never consumed).
            Tr = jnp.where(hitm, Lr + Ar * Tr_h, jnp.where(missm, sky_r, Tr))
            Tg = jnp.where(hitm, Lg + Ag * Tg_h, jnp.where(missm, sky_g, Tg))
            Tb = jnp.where(hitm, Lb + Ab * Tb_h, jnp.where(missm, sky_b, Tb))
            return (Tr, Tg, Tb)

        T0 = (jnp.full((th, tw), sky_r), jnp.full((th, tw), sky_g),
              jnp.full((th, tw), sky_b))
        jax.lax.fori_loop(0, max_bounces + 1, bwd_body, T0)
        return carry

    jax.lax.fori_loop(0, spp, sample_body, 0)

    # ---- reduce tile accumulators to scalars, sum across grid programs ----
    @pl.when(first)
    def _():
        # element stores only: SMEM refs reject vector writes
        def z(mi, _):
            for k in range(8):
                out_ref[mi, k] = jnp.float32(0.0)
            return 0
        jax.lax.fori_loop(0, n_mat + 1, z, 0)

    def reduce_mat(mi, _):
        for k in range(8):
            out_ref[mi, k] = out_ref[mi, k] + jnp.sum(acc[mi, k])
        return 0

    jax.lax.fori_loop(0, n_mat, reduce_mat, 0)
    for c in range(3):
        out_ref[n_mat, c] = out_ref[n_mat, c] + jnp.sum(sky_acc[c])


def _fit_tile(rows, width, tile, n_mat, max_bounces, bounce_planes=8):
    """Largest kernel tile that (a) divides the row block / width, and
    (b) keeps the backward's VMEM scratch within budget.

    The scratch is ``th*tw*4 * ((B+1)*bounce_planes + n_mat*8 + 3)`` bytes
    (per-bounce replay stores plus the per-material accumulator planes) —
    note the ``n_mat`` term: many-material scenes must shrink the tile or
    blow the ~16 MB VMEM budget. Tile heights prefer multiples of 8 (f32
    sublane). ``bounce_planes`` is 8 for the reference-tier backward and
    15 for the physical tier's (which also stores NEE data).
    """
    th0, tw0 = tile
    tw = min(tw0, width)
    while width % tw:
        tw -= 1

    def divisor_leq(n, cap):
        best = 1
        for d in range(1, cap + 1):
            if n % d == 0 and (d % 8 == 0 or d <= 8 or n % 8):
                best = d
        return best

    th = divisor_leq(rows, min(th0, rows))
    budget = 10 * 2**20  # leave headroom for g tile + compiler temps
    scratch = lambda t: t * tw * 4 * (
        (max_bounces + 1) * bounce_planes + n_mat * 8 + 3
    )
    while th > 1 and scratch(th) > budget:
        th = divisor_leq(rows, max(th // 2, 1))
        if scratch(th) > budget and th == 1:
            break
    return th, tw


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "spp", "max_bounces", "tile", "interpret",
        "rows", "jitter",
    ),
)
def render_pallas_bwd(
    scene: Scene,
    camera: Camera,
    g,  # (rows, W, 3) cotangent of the radiance image (row block)
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    seed,
    sample_offset=0,
    tile=BWD_TILE,
    interpret: bool = False,
    row_start=0,
    rows: int | None = None,
    jitter: bool = False,
):
    """VJP of :func:`pallas_kernels.render_pallas` w.r.t. the scene.

    Returns a Scene-shaped cotangent pytree (zeros for geometry, roughness,
    IOR, metallicity and masks — exactly what AD produces, see module
    docstring). ``row_start``/``rows`` select a row block with global-index
    RNG, so the kernel runs per shard under ``shard_map`` — shard_map's
    transpose then psums the replicated scene's cotangents across the mesh.
    The tile auto-shrinks to divide odd row counts and to bound the
    n_mat-dependent VMEM scratch.
    """
    rows = height if rows is None else rows
    th, tw = _fit_tile(rows, width, tile, scene.num_materials, max_bounces)
    interpret = interpret or jax.default_backend() != "tpu"

    n_mat = scene.num_materials
    bplus = max_bounces + 1
    kern = partial(
        _bwd_kernel,
        th=th, tw=tw,
        n_sph=scene.num_spheres,
        n_tri=scene.num_triangles,
        n_mat=n_mat,
        spp=spp,
        max_bounces=max_bounces,
        jitter=jitter,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    par_i = jnp.stack(
        [jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
         jnp.asarray(sample_offset, jnp.int32),
         jnp.asarray(row_start, jnp.int32)]
    )[None, :]
    g_planes = jnp.transpose(g.astype(jnp.float32), (2, 0, 1))  # (3, rows, W)

    operands = fk._scene_operands(scene) + [
        fk._camera_params(camera, scene, height, width),
        par_i,
        g_planes,
    ]
    out = pl.pallas_call(
        kern,
        grid=(rows // th, width // tw),
        in_specs=[smem() for _ in operands[:-1]]
        + [pl.BlockSpec((3, th, tw), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)],
        # SMEM: the output is a handful of scalars accumulated with
        # element stores, which Mosaic forbids on VMEM refs.
        out_specs=pl.BlockSpec(
            (n_mat + 1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_mat + 1, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bplus, 3, th, tw), jnp.float32),
            pltpu.VMEM((bplus, 4, th, tw), jnp.float32),
            pltpu.VMEM((bplus, th, tw), jnp.int32),
            pltpu.VMEM((n_mat, 8, th, tw), jnp.float32),
            pltpu.VMEM((3, th, tw), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    import dataclasses

    zeros = lambda x: jnp.zeros_like(x)
    mats = scene.materials
    d_mats = dataclasses.replace(
        mats,
        albedo=out[:n_mat, 0:3],
        emission_color=out[:n_mat, 3:6],
        emission_strength=out[:n_mat, 6],
        transparency=out[:n_mat, 7],
        roughness=zeros(mats.roughness),
        metallicity=zeros(mats.metallicity),
        refractive_index=zeros(mats.refractive_index),
    )
    return dataclasses.replace(
        scene,
        materials=d_mats,
        spheres=jax.tree_util.tree_map(zeros, scene.spheres),
        triangles=jax.tree_util.tree_map(zeros, scene.triangles),
        sky_color=out[n_mat, 0:3],
    )
