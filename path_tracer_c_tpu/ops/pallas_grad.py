"""Fused primal + Jacobian Pallas kernel for the path-trace VJP.

Reverse-mode through the XLA core integrator is HBM-bound and ~100x
slower than the Pallas forward. Round 2 paired the forward megakernel
with a separate replay + suffix-sweep backward kernel — correct, but the
VJP then paid the forward TWICE (standalone primal + the backward's
replay): ~2.8 forward-equivalents of kernel time. This round fuses them:
**one kernel emits the primal image AND a per-pixel material Jacobian**,
and the backward becomes a tiny XLA contraction of the upstream cotangent
``g`` with that Jacobian — ~1.5 forward-equivalents total.

Why a per-pixel Jacobian is exact and small: per sample, radiance is
``total[c] = sum_b P_b[c] * E_b[c] + P_end[c] * sky[c]`` where ``P_b`` is
the prefix product of ``albedo * ratio`` along the path and ``E_b`` the
bounce's emission (or sky on a miss). All *continuous* scene dependence
lives in the albedo/emission/transparency/sky factors — material indices,
hit distances, normals and directions enter only through discrete events,
so their cotangents are exactly zero (the AD tests pin this down). Every
material cotangent is therefore **linear in g** with per-pixel weights:

    d_albedo[m,c]   = sum_p g[p,c] * A[m,c,p] / spp
    d_eco[m,c]      = es_m  * sum_p g[p,c] * S[m,c,p] / spp
    d_est[m]        = sum_c ec_mc * sum_p g[p,c] * S[m,c,p] / spp
    d_transp[m]     = sum_c al_mc * sum_p g[p,c] * R[m,c,p] / spp
    d_sky[c]        = sum_p g[p,c] * K[c,p] / spp

with the weight planes accumulated over samples and bounces:

    A[m,c] = sum_b [mat_b=m, hit] P_b[c] * T_b[c]       (albedo)
    S[m,c] = sum_b [mat_b=m, hit] P_b[c]                (emission)
    R[m,c] = sum_b [mat_b=m, hit] P_b[c] * T_b[c] * dr_b (transparency,
             ratio reparameterization: dr = 1/t on refract, -1/(1-t) on
             reflect)
    K[c]   = sum_b [miss] P_b[c]  +  P_end[c]           (sky)

``T_b[c]`` — the suffix "radiance collected after bounce b per unit
throughput" — is built by the same in-kernel suffix sweep as before
(``T_{b-1} = Le_b + albedo_b * T_b`` on surviving lanes, 0 after a TIR
death, sky at a miss), from per-bounce VMEM stores made while the kernel
runs the forward once (the forward IS the replay now, and also emits the
primal tile). The zero-albedo subtlety is preserved: a lane killed by an
exactly-zero albedo has P == 0 downstream yet its albedo cotangent
``g*P_b*T_b`` needs ``T_b`` built from the future path, so the bounce
loop exits only on *structural* deaths (miss / TIR), never on zero
throughput.

``jax.grad`` through :func:`pallas_kernels.render_pallas_vjp` runs the
fused kernel in the custom_vjp's fwd rule (primal + Jacobian residual,
~1.4x a plain forward) and the contraction in the bwd rule (~free), so
fwd+bwd no longer re-traces a single ray. Supports the default "gpu"
variant, with or without anti-aliasing jitter and row-block sharding
(``row_start``/``rows``); the "cpu" tier (whose per-sample clamp breaks
the product structure) falls back to core-path AD.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from ..ops.camera import Camera
from . import pallas_kernels as fk

__all__ = [
    "render_pallas_fused", "render_pallas_bwd", "contract_jacobian",
    "BWD_TILE", "FUSED_TILE",
]

# Two-pass (oracle) backward tile. Like the round-2 backward, per-bounce
# stores live in VMEM scratch (not loop-carried vregs), so larger tiles
# amortize the per-material accumulator loop; the n_mat-dependent
# Jacobian output block bounds it (see _fit_tile).
BWD_TILE = (64, 128)

# Fused primal+Jacobian kernel tile. The r5 accumulation-loop unrolling
# interacts with tile height: with the mat_body plane-RMWs unrolled the
# sweet spot drops to (32,128) — measured (1024^2/64spp/8b glossy):
# rolled-acc (32,128)=2.75, (64,128)=2.90; UNROLLED-acc (16,128)=3.11,
# (32,128)=3.34, (64,128)=2.47 Grays/s. Unrolled @ (32,128) wins +15%.
FUSED_TILE = (32, 128)

# Per-material Jacobian planes: A[3] + S[3] + R[3] (module docstring).
_MAT_J_PLANES = 9
# Per-bounce replay scratch planes, counted from _fused_kernel's
# scratch_shapes: P[3] + masks[3] + albedo[3] + Le[3] + dr[1] = 13 f32
# plus the i32 material plane (same VMEM cost) = 14.
_BOUNCE_PLANES = 14


def _fused_kernel(
    sph_c, sph_r, sph_m, sph_a,
    tri_v0, tri_v1, tri_v2, tri_n, tri_m, tri_a,
    m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
    par_f, par_i,
    img_ref,  # (3, TH, TW) VMEM: primal radiance tile (mean over spp)
    j_ref,  # (9*M + 3, TH, TW) VMEM: Jacobian planes; last 3 = sky K
    # with count_rounds: a (1, 1) SMEM executed-round counter, then
    # scratch: p_store (B+1,3) prefix throughput, mk_store (B+1,3)
    # hit/miss/tir masks, mat_store (B+1) i32, alb_store (B+1,3),
    # le_store (B+1,3), dr_store (B+1) transparency ratio derivative
    *rest,
    th, tw, n_sph, n_tri, n_mat, spp, max_bounces, jitter, mat_skip,
    early_exit="once",
    count_rounds=False,
):
    if count_rounds:
        (cnt_ref, p_store, mk_store, mat_store, alb_store, le_store,
         dr_store) = rest
    else:
        (p_store, mk_store, mat_store, alb_store, le_store,
         dr_store) = rest
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    if count_rounds:
        @pl.when((ti == 0) & (tj == 0))
        def _():
            cnt_ref[0, 0] = jnp.int32(0)

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
    n_j = _MAT_J_PLANES * n_mat + 3

    # zero the Jacobian output block (accumulated across samples/bounces)
    def zero_j(k, _):
        j_ref[k] = zero
        return 0

    jax.lax.fori_loop(0, n_j, zero_j, 0)

    closest_hit, fetch_materials, _ = fk.make_geometry(
        sph_c, sph_r, sph_m, sph_a, tri_v0, tri_v1, tri_v2, tri_n, tri_m,
        tri_a, m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
        (sky_r, sky_g, sky_b), th, tw, n_sph, n_tri, n_mat,
    )

    cam_ox = jnp.full((th, tw), cox)
    cam_oy = jnp.full((th, tw), coy)
    cam_oz = jnp.full((th, tw), coz)
    if not jitter:
        hit0 = closest_hit(cam_ox, cam_oy, cam_oz, pdx, pdy, pdz)
        mats0 = fetch_materials(hit0[4])
    # whole-tile sky gate (see pallas_kernels._kernel): sound only when
    # bounce 0 is sample-invariant
    tile_gate = early_exit == "once" and not jitter

    def sample_body(s, acc_img):
        acc_r, acc_g, acc_b = acc_img[:3]
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

        # ---- forward (= replay), storing per-bounce data + radiance ----
        def fwd_body(b, fc):
            # Dead lanes trace garbage, but every contribution their
            # garbage could make is multiplied by the stored prefix
            # P == 0, and the suffix sweep's carry for a dead lane is
            # re-anchored at the bounce where the real death event is
            # stored, so later corruption never propagates past it. The
            # bounce loop CANNOT exit on zero throughput: a lane killed by
            # an exactly-zero albedo has P == 0 downstream yet its albedo
            # cotangent g*P_b*T_b needs T_b built from the *untraced
            # future* path, so only structural deaths (miss / TIR) end it
            # — tracked in ``done`` (f32 0/1; Mosaic can't carry i1
            # vectors).
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, rng, done) = fc
            if jitter:
                hit = closest_hit(ox, oy, oz, dx, dy, dz)
            else:
                hit = jax.lax.cond(
                    b == 0,
                    lambda: hit0,
                    lambda: closest_hit(ox, oy, oz, dx, dy, dz),
                )
            bt, nx, ny, nz, mat = hit
            hitmask = bt < fk._INF

            p_store[b, 0] = tr
            p_store[b, 1] = tg
            p_store[b, 2] = tb
            mat_store[b] = mat

            if jitter:
                mats = fetch_materials(mat)
            else:
                mats = jax.lax.cond(
                    b == 0, lambda: mats0, lambda: fetch_materials(mat)
                )
            (alb_r, alb_g, alb_b, em_r, em_g, em_b, rgh, trn, ior) = mats
            alb_store[b, 0] = alb_r
            alb_store[b, 1] = alb_g
            alb_store[b, 2] = alb_b
            le_store[b, 0] = em_r
            le_store[b, 1] = em_g
            le_store[b, 2] = em_b

            # primal: sky on miss, Le then albedo on hit
            # (rtx_frag.glsl:226-230); miss lanes terminate by zeroed
            # throughput.
            ar = ar + jnp.where(hitmask, tr * em_r, tr * sky_r)
            ag = ag + jnp.where(hitmask, tg * em_g, tg * sky_g)
            ab = ab + jnp.where(hitmask, tb * em_b, tb * sky_b)
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

            # Dead lanes store garbage events here, but the sweep
            # multiplies every contribution by their stored P == 0 and
            # re-anchors the carry at the real death event, so un-gated
            # stores are exact.
            mk_store[b, 0] = jnp.where(hitmask, 1.0, 0.0)
            mk_store[b, 1] = jnp.where(hitmask, 0.0, 1.0)
            mk_store[b, 2] = jnp.where(died & hitmask, 1.0, 0.0)
            # transparency ratio derivative (reparameterization): the
            # estimator's per-bounce factor is albedo * ratio with
            # ratio = t/t_detached (refract) or (1-t)/(1-t)_detached.
            dr_store[b] = jnp.where(
                choose_refr,
                1.0 / jnp.maximum(trn, 1e-6),
                -1.0 / jnp.maximum(1.0 - trn, 1e-6),
            )

            # Structural death this bounce: miss or TIR. Zero albedo is
            # NOT a death (see fwd_body docstring).
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
                    pz + offs * side * nz, ndx, ndy, ndz, tr, tg, tb,
                    ar, ag, ab, rng, done)

        # No mask pre-zeroing needed: the sweep's dynamic lower bound
        # visits exactly the bounces the replay wrote.
        fc0 = (
            cam_ox, cam_oy, cam_oz, sdx, sdy, sdz,
            ones, ones, ones, zero, zero, zero, st, zero,
        )

        # Early-exit menu (same as the forward kernel): "once" pays ONE
        # structural-death reduce after round 0 — sky tiles (the common
        # all-dead case) still skip the budget, content tiles run it
        # unconditionally. Extra rounds on mid-dying tiles are exact:
        # dead lanes store P == 0 and the sweep re-anchors at the stored
        # death event, so fully-written stores are always safe.
        # (under the tile gate this per-sample check stays: TIR on a
        # bounce-0 glass hit is per-sample even with shared primaries)
        if early_exit == "once":
            fc1 = fwd_body(0, fc0)
            alive0 = jnp.min(fc1[13]) < 1.0
            fc = jax.lax.cond(
                alive0,
                lambda f: jax.lax.fori_loop(1, max_bounces + 1,
                                            fwd_body, f),
                lambda f: f,
                fc1,
            )
            bend = jnp.where(alive0, jnp.int32(max_bounces + 1),
                             jnp.int32(1))
        else:
            def w_cond(c):
                b, fc = c
                if not early_exit:
                    return b < max_bounces + 1
                return (b < max_bounces + 1) & (jnp.min(fc[13]) < 1.0)

            def w_body(c):
                b, fc = c
                return b + 1, fwd_body(b, fc)

            bend, fc = jax.lax.while_loop(w_cond, w_body,
                                          (jnp.int32(0), fc0))
        (_, _, _, _, _, _, tr_e, tg_e, tb_e, ar, ag, ab, _, _) = fc

        # bounce budget exhausted -> sky, both for the primal and for the
        # sky weight K (dead lanes carry P == 0, so no mask is needed).
        # Sum into ar BEFORE the accumulator add — the same association
        # the forward kernel uses, keeping the primal bit-identical.
        ar = ar + tr_e * sky_r
        ag = ag + tg_e * sky_g
        ab = ab + tb_e * sky_b
        acc_r = acc_r + ar
        acc_g = acc_g + ag
        acc_b = acc_b + ab
        sky_base = _MAT_J_PLANES * n_mat
        j_ref[sky_base + 0] = j_ref[sky_base + 0] + tr_e
        j_ref[sky_base + 1] = j_ref[sky_base + 1] + tg_e
        j_ref[sky_base + 2] = j_ref[sky_base + 2] + tb_e

        # ---- suffix sweep: build T_b and accumulate Jacobian planes ----
        def bwd_body(i, T):
            b = max_bounces - i
            Tr, Tg, Tb = T
            hitm = mk_store[b, 0] > 0.0
            missm = mk_store[b, 1] > 0.0
            tirm = mk_store[b, 2] > 0.0
            mat = mat_store[b]
            # The sweep's dynamic lower bound only visits bounces the
            # replay wrote, so every store read here is initialized; the
            # event-mask selects keep dead lanes' garbage out of the
            # accumulators regardless.
            Pr = jnp.where(hitm | missm, p_store[b, 0], 0.0)
            Pg = jnp.where(hitm | missm, p_store[b, 1], 0.0)
            Pb_ = jnp.where(hitm | missm, p_store[b, 2], 0.0)

            # TIR lanes have no downstream throughput cotangent.
            Tr_h = jnp.where(tirm, 0.0, Tr)
            Tg_h = jnp.where(tirm, 0.0, Tg)
            Tb_h = jnp.where(tirm, 0.0, Tb)

            # sky weight K from misses at this bounce
            sky_base = _MAT_J_PLANES * n_mat
            mr = jnp.where(missm, Pr, 0.0)
            mg = jnp.where(missm, Pg, 0.0)
            mb = jnp.where(missm, Pb_, 0.0)
            j_ref[sky_base + 0] = j_ref[sky_base + 0] + mr
            j_ref[sky_base + 1] = j_ref[sky_base + 1] + mg
            j_ref[sky_base + 2] = j_ref[sky_base + 2] + mb

            # per-lane weight pieces (hit lanes only)
            cAr = jnp.where(hitm, Pr * Tr_h, 0.0)
            cAg = jnp.where(hitm, Pg * Tg_h, 0.0)
            cAb = jnp.where(hitm, Pb_ * Tb_h, 0.0)
            cSr = jnp.where(hitm, Pr, 0.0)
            cSg = jnp.where(hitm, Pg, 0.0)
            cSb = jnp.where(hitm, Pb_, 0.0)
            dr = jnp.where(hitm, dr_store[b], 0.0)
            cRr = cAr * dr
            cRg = cAg * dr
            cRb = cAb * dr

            # accumulate per material. The weight planes are already zero
            # off their event masks, so the material mask alone (no & hitm)
            # segregates exactly. ``mat_skip`` guards each material's 9
            # read-modify-writes behind a tile-level presence test — a
            # cross-lane reduce per material. Measured on v5e (glossy,
            # n_mat=15): the reduce costs MORE than the 9 masked FMAs it
            # elides (0.393 s vs 0.294 s per fused render), so the
            # default is the unconditional path; the flag remains for
            # scenes with very large material tables.
            def mat_body(mi, _):
                mskf = jnp.where(mat == mi, 1.0, 0.0)

                def accumulate():
                    base = _MAT_J_PLANES * mi
                    j_ref[base + 0] = j_ref[base + 0] + mskf * cAr
                    j_ref[base + 1] = j_ref[base + 1] + mskf * cAg
                    j_ref[base + 2] = j_ref[base + 2] + mskf * cAb
                    j_ref[base + 3] = j_ref[base + 3] + mskf * cSr
                    j_ref[base + 4] = j_ref[base + 4] + mskf * cSg
                    j_ref[base + 5] = j_ref[base + 5] + mskf * cSb
                    j_ref[base + 6] = j_ref[base + 6] + mskf * cRr
                    j_ref[base + 7] = j_ref[base + 7] + mskf * cRg
                    j_ref[base + 8] = j_ref[base + 8] + mskf * cRb

                if mat_skip:
                    hit_here = jnp.where(mat == mi, mk_store[b, 0], 0.0)
                    pl.when(jnp.max(hit_here) > 0.0)(accumulate)
                else:
                    accumulate()
                return 0

            # unrolled accumulation (static j_ref plane indices), paired
            # with the (32,128) FUSED_TILE: see the tile-choice comment
            # — unrolling at the old (64,128) tile REGRESSED (2.47 vs
            # 2.90), at (32,128) it wins (3.34).
            fk._scene_loop(n_mat, mat_body, 0)

            # carry: T_{b-1} = Le_b + albedo_b * T_b (hit), sky (miss),
            # pass-through (lane already dead — value never consumed).
            Lr = jnp.where(hitm, le_store[b, 0], 0.0)
            Lg = jnp.where(hitm, le_store[b, 1], 0.0)
            Lb = jnp.where(hitm, le_store[b, 2], 0.0)
            Ar = jnp.where(hitm, alb_store[b, 0], 0.0)
            Ag = jnp.where(hitm, alb_store[b, 1], 0.0)
            Ab = jnp.where(hitm, alb_store[b, 2], 0.0)
            Tr = jnp.where(hitm, Lr + Ar * Tr_h, jnp.where(missm, sky_r, Tr))
            Tg = jnp.where(hitm, Lg + Ag * Tg_h, jnp.where(missm, sky_g, Tg))
            Tb = jnp.where(hitm, Lb + Ab * Tb_h, jnp.where(missm, sky_b, Tb))
            return (Tr, Tg, Tb)

        # Sweep only the bounces the replay executed (dynamic lower
        # bound): bounces >= bend have all-zero masks and would be
        # no-ops, but still cost the loop body. T0 = sky is only read by
        # lanes alive at bend (budget exhaustion); dead lanes re-anchor
        # their carry at their death bounce.
        T0 = (jnp.full((th, tw), sky_r), jnp.full((th, tw), sky_g),
              jnp.full((th, tw), sky_b))
        jax.lax.fori_loop(max_bounces + 1 - bend, max_bounces + 1,
                          bwd_body, T0)
        if count_rounds:
            return (acc_r, acc_g, acc_b, acc_img[3] + bend)
        return (acc_r, acc_g, acc_b)

    acc0 = (zero, zero, zero) + (
        (jnp.int32(0),) if count_rounds else ()
    )
    if tile_gate:
        # Whole-tile sky gate (pallas_kernels._kernel): all primaries
        # miss -> every sample's primal is exactly sky and the ONLY
        # nonzero Jacobian entry is the sky weight K += P_0 == 1 per
        # sample (the sweep's single miss round). The gated branch
        # replays that arithmetic exactly: sequential ones-sums equal a
        # single +spp for integer-valued f32 (spp << 2^24), and the
        # sequential acc += sky matches the live path's rounding.
        tile_alive = jnp.max(jnp.where(hit0[0] < fk._INF, 1.0, 0.0)) > 0.0

        def run_sky():
            sky_base = _MAT_J_PLANES * n_mat
            sppf = jnp.float32(spp)
            for c in range(3):
                j_ref[sky_base + c] = j_ref[sky_base + c] + sppf * ones

            def sbody(s, a):
                # gated sky tiles report 0 executed rounds (same
                # convention as the forward kernels' counter)
                out = (a[0] + sky_r, a[1] + sky_g, a[2] + sky_b)
                return out + ((a[3],) if count_rounds else ())

            return jax.lax.fori_loop(0, spp, sbody, acc0)

        acc = jax.lax.cond(
            tile_alive,
            lambda: jax.lax.fori_loop(0, spp, sample_body, acc0),
            run_sky,
        )
    else:
        acc = jax.lax.fori_loop(0, spp, sample_body, acc0)
    inv = jnp.float32(1.0 / spp)
    img_ref[0] = acc[0] * inv
    img_ref[1] = acc[1] * inv
    img_ref[2] = acc[2] * inv
    if count_rounds:
        cnt_ref[0, 0] = cnt_ref[0, 0] + acc[3]


def fused_tile(scene, rows, width, max_bounces, tile=FUSED_TILE):
    """The (th, tw) kernel tile render_pallas_fused will pick for this
    workload — the executed-round counter's rays-per-round factor
    (bench.py converts counts to executed rays with it)."""
    return _fit_tile(rows, width, tile, scene.num_materials, max_bounces)


def _fit_tile(rows, width, tile, n_mat, max_bounces,
              bounce_planes=_BOUNCE_PLANES,
              mat_planes=_MAT_J_PLANES, fixed_planes=6):
    """Largest kernel tile that (a) divides the row block / width, and
    (b) keeps the kernel's VMEM footprint within budget.

    The footprint is ``th*tw*4 * ((B+1)*bounce_planes + n_mat*mat_planes
    + fixed_planes)`` bytes (per-bounce replay stores plus the
    per-material accumulator/Jacobian planes) — note the ``n_mat`` term:
    many-material scenes must shrink the tile or blow the ~16 MB VMEM
    budget. Tile heights prefer multiples of 8 (f32 sublane).
    ``bounce_planes`` is ``_BOUNCE_PLANES`` (14: 13 f32 + 1 i32) for the
    fused reference-tier kernel; the physical tier passes its own counts
    (``_PHYS_BOUNCE_PLANES``/``_PHYS_FUSED_BOUNCE_PLANES``)."""
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
    budget = 10 * 2**20  # leave headroom for compiler temps
    scratch = lambda t: t * tw * 4 * (
        (max_bounces + 1) * bounce_planes + n_mat * mat_planes + fixed_planes
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
        "rows", "jitter", "mat_skip", "early_exit", "count_rounds",
    ),
)
def render_pallas_fused(
    scene: Scene,
    camera: Camera,
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    seed,
    sample_offset=0,
    tile=FUSED_TILE,
    interpret: bool = False,
    row_start=0,
    rows: int | None = None,
    jitter: bool = False,
    mat_skip: bool = False,
    early_exit: bool | str = "once",
    count_rounds: bool = False,
):
    """Primal radiance image (rows, W, 3) PLUS its per-pixel material
    Jacobian (9*M+3, rows, W) in one kernel pass (module docstring).
    ``count_rounds=True`` appends the executed bounce-round total (the
    replay loop's rounds — the denominator for executed-basis SoL) to
    the return: ``(img, jac, executed_rounds)``.

    The Jacobian output is an O(n_mat * rows * width) HBM array —
    ``(9*n_mat + 3) * rows * width * 4`` bytes (~0.5 GB at 1024^2 with
    15 materials); the VJP holds it as its residual from forward to
    backward (ADVICE r3 — size fit workloads accordingly).

    The Jacobian rows are, per material m: A[3] (albedo), S[3] (emission),
    R[3] (transparency), then 3 sky-K planes; contract with the image
    cotangent via :func:`contract_jacobian`. ``row_start``/``rows`` select
    a row block with global-index RNG, so the pair runs per shard under
    ``shard_map``."""
    rows = height if rows is None else rows
    th, tw = _fit_tile(rows, width, tile, scene.num_materials, max_bounces)
    interpret = interpret or jax.default_backend() != "tpu"

    n_mat = scene.num_materials
    bplus = max_bounces + 1
    n_j = _MAT_J_PLANES * n_mat + 3
    kern = partial(
        _fused_kernel,
        th=th, tw=tw,
        n_sph=scene.num_spheres,
        n_tri=scene.num_triangles,
        n_mat=n_mat,
        spp=spp,
        max_bounces=max_bounces,
        jitter=jitter,
        mat_skip=mat_skip,
        early_exit=early_exit,
        count_rounds=count_rounds,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    par_i = jnp.stack(
        [jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
         jnp.asarray(sample_offset, jnp.int32),
         jnp.asarray(row_start, jnp.int32)]
    )[None, :]

    operands = fk._scene_operands(scene) + [
        fk._camera_params(camera, scene, height, width),
        par_i,
    ]
    out_specs = [
        pl.BlockSpec((3, th, tw), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_j, th, tw), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, rows, width), jnp.float32),
        jax.ShapeDtypeStruct((n_j, rows, width), jnp.float32),
    ]
    if count_rounds:
        out_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=(rows // th, width // tw),
        in_specs=[smem() for _ in operands],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bplus, 3, th, tw), jnp.float32),  # p_store
            pltpu.VMEM((bplus, 3, th, tw), jnp.float32),  # mk_store
            pltpu.VMEM((bplus, th, tw), jnp.int32),  # mat_store
            pltpu.VMEM((bplus, 3, th, tw), jnp.float32),  # alb_store
            pltpu.VMEM((bplus, 3, th, tw), jnp.float32),  # le_store
            pltpu.VMEM((bplus, th, tw), jnp.float32),  # dr_store
        ],
        interpret=interpret,
    )(*operands)
    if count_rounds:
        img, jac, cnt = out
        return jnp.transpose(img, (1, 2, 0)), jac, cnt[0, 0]
    img, jac = out
    return jnp.transpose(img, (1, 2, 0)), jac


def contract_jacobian(scene: Scene, jac, g, spp: int):
    """Scene cotangent pytree from the fused kernel's Jacobian and the
    image cotangent ``g`` (rows, W, 3) — the whole backward pass is this
    contraction (a few fused elementwise-reduce ops in XLA)."""
    n_mat = scene.num_materials
    mats = scene.materials
    g_cp = jnp.transpose(g.astype(jnp.float32), (2, 0, 1))  # (3, rows, W)
    # (m, kind{A,S,R}, c): contract every material plane with its channel
    jm = jac[: _MAT_J_PLANES * n_mat].reshape(
        n_mat, 3, 3, jac.shape[1], jac.shape[2]
    )
    gq = jnp.einsum("mkchw,chw->mkc", jm, g_cp) / spp
    d_alb = gq[:, 0]
    d_eco = gq[:, 1] * mats.emission_strength[:, None]
    d_est = jnp.sum(gq[:, 1] * mats.emission_color, axis=1)
    d_trn = jnp.sum(gq[:, 2] * mats.albedo, axis=1)
    d_sky = (
        jnp.einsum("chw,chw->c", jac[_MAT_J_PLANES * n_mat:], g_cp) / spp
    )

    zeros = lambda x: jnp.zeros_like(x)
    d_mats = dataclasses.replace(
        mats,
        albedo=d_alb,
        emission_color=d_eco,
        emission_strength=d_est,
        transparency=d_trn,
        roughness=zeros(mats.roughness),
        metallicity=zeros(mats.metallicity),
        refractive_index=zeros(mats.refractive_index),
    )
    return dataclasses.replace(
        scene,
        materials=d_mats,
        spheres=jax.tree_util.tree_map(zeros, scene.spheres),
        triangles=jax.tree_util.tree_map(zeros, scene.triangles),
        sky_color=d_sky,
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
    """VJP of :func:`pallas_kernels.render_pallas` w.r.t. the scene:
    the fused kernel's Jacobian contracted with ``g``.

    Returns a Scene-shaped cotangent pytree (zeros for geometry,
    roughness, IOR, metallicity and masks — exactly what AD produces, see
    module docstring). Standalone entry point for when only the backward
    is wanted; ``jax.grad`` through ``render_pallas_vjp`` instead reuses
    the Jacobian already produced by its forward pass."""
    rows = height if rows is None else rows
    _, jac = render_pallas_fused(
        scene, camera, height, width, spp, max_bounces, seed,
        sample_offset=sample_offset, tile=tile, interpret=interpret,
        row_start=row_start, rows=rows, jitter=jitter,
    )
    return contract_jacobian(scene, jac, g, spp)
