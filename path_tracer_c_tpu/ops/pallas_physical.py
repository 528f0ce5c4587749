"""Pallas TPU megakernel for the physical shading tier (BRDF + NEE).

The fast path for BASELINE config 3's "importance-sampled BRDF": the same
estimator as ``models/physical.py`` (cosine-weighted diffuse lobe, mirror
specular, reference-tier refraction, next-event estimation against
emissive spheres by solid-angle cone sampling) run as a VMEM-resident
wavefront kernel, one Pallas program per pixel tile — the physical tier's
analog of the reference-tier megakernel in ``pallas_kernels.py`` (which
reproduces ``/root/reference/shaders/rtx_frag.glsl:194-274``; the physical
tier is the capability *extension* SURVEY.md §7 assigns to config 3).

Per bounce the kernel runs TWO intersection queries: the path's closest
hit (shared ``make_geometry`` code — the invariant that the backward
replay and every tier intersect identically) and a distance-only shadow
query for NEE visibility. RNG is the physical tier's fixed 7-draw
schedule (u_transp, u_lobe, 2 BSDF, 1 emitter pick, 2 cone draws) on the
same PCG streams as the core path, so interpreter-mode renders match
``render_physical`` to f32 rounding.

The emissive-sphere table (cumulative emitter count + per-sphere
premultiplied radiance) is built host-side from the scene and shipped as
SMEM operands — the physical tier's extension of the uniform-upload
analog (pallas_kernels._scene_operands).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from ..ops.camera import Camera
from ..models.integrator import DEFAULT_EPS_OFFSET, EPS_OFFSET_SCALE
from . import pallas_kernels as fk

__all__ = ["render_physical_pallas"]

_INV_PI = np.float32(1.0 / math.pi)
_TWO_PI = np.float32(2.0 * math.pi)


def _onb(nx, ny, nz):
    """Branchless orthonormal basis (Duff et al. 2017) — plane-wise port
    of models/physical._onb."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx = 1.0 + sign * nx * nx * a
    ty = sign * b
    tz = -sign * nx
    bx = b
    by = sign + ny * ny * a
    bz = -ny
    return (tx, ty, tz), (bx, by, bz)


def _phys_kernel(
    sph_c, sph_r, sph_m, sph_a,
    tri_v0, tri_v1, tri_v2, tri_n, tri_m, tri_a,
    m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
    em_cum,  # (S, 1) int32 cumulative count of emissive spheres
    le_sph,  # (S, 3) f32 premultiplied emitter radiance (eco * est)
    par_f,
    par_i,  # (1, 4) int32: seed, sample_offset, row_start, n_em
    out_ref,  # (3, TH, TW) VMEM
    *,
    th, tw, n_sph, n_tri, n_mat, spp, max_bounces, jitter, nee,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

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
    row_start = par_i[0, 2]
    n_em = par_i[0, 3]
    n_em_f = n_em.astype(jnp.float32)
    has_em = n_em > 0

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

    closest_hit, _, _ = fk.make_geometry(
        sph_c, sph_r, sph_m, sph_a, tri_v0, tri_v1, tri_v2, tri_n, tri_m,
        tri_a, m_alb, m_eco, m_est, m_rgh, m_trn, m_ior,
        (sky_r, sky_g, sky_b), th, tw, n_sph, n_tri, n_mat,
    )
    closest_hit_kind = closest_hit.kind
    closest_t = closest_hit.closest_t

    cam_ox = jnp.full((th, tw), cox)
    cam_oy = jnp.full((th, tw), coy)
    cam_oz = jnp.full((th, tw), coz)

    def fetch_materials(mat):
        """Physical-tier material fetch: the reference-tier planes plus the
        raw emission strength (for the NEE single-counting test)."""
        alb_r = zero; alb_g = zero; alb_b = zero
        em_r = zero; em_g = zero; em_b = zero
        est = zero; rgh = zero; trn = zero
        ior = ones

        def mat_body(mi, c):
            alr, alg, alb_, emr, emg, emb, es_, rg, tn, io = c
            msk = mat == mi
            es = m_est[mi, 0]
            return (
                jnp.where(msk, m_alb[mi, 0], alr),
                jnp.where(msk, m_alb[mi, 1], alg),
                jnp.where(msk, m_alb[mi, 2], alb_),
                jnp.where(msk, m_eco[mi, 0] * es, emr),
                jnp.where(msk, m_eco[mi, 1] * es, emg),
                jnp.where(msk, m_eco[mi, 2] * es, emb),
                jnp.where(msk, es, es_),
                jnp.where(msk, m_rgh[mi, 0], rg),
                jnp.where(msk, m_trn[mi, 0], tn),
                jnp.where(msk, m_ior[mi, 0], io),
            )

        return jax.lax.fori_loop(
            0, n_mat, mat_body,
            (alb_r, alb_g, alb_b, em_r, em_g, em_b, est, rgh, trn, ior),
        )

    def bounce(st_):
        """One physical-tier bounce — the plane-wise port of
        models/physical.trace_paths_physical's ``step`` (same op order,
        same 7-draw schedule). Termination is zero throughput; ``prevd``
        (f32 0/1) is the diffuse-arrival flag for NEE single-counting."""
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, rng, prevd) = st_
        bt, nx, ny, nz, mat, sphm = closest_hit_kind(ox, oy, oz, dx, dy, dz)
        hitm = bt < fk._INF

        # miss -> sky, terminate by zeroing throughput
        ar = ar + jnp.where(hitm, 0.0, tr * sky_r)
        ag = ag + jnp.where(hitm, 0.0, tg * sky_g)
        ab = ab + jnp.where(hitm, 0.0, tb * sky_b)
        tr = jnp.where(hitm, tr, 0.0)
        tg = jnp.where(hitm, tg, 0.0)
        tb = jnp.where(hitm, tb, 0.0)

        (alb_r, alb_g, alb_b, em_r, em_g, em_b, est, rgh, trn, ior) = (
            fetch_materials(mat)
        )

        # Le, skipped when this vertex was reached by a diffuse-sampled ray
        # and the emitter was light-sampleable (models/physical.py:117-125).
        if nee:
            nee_counted = (prevd > 0.0) & (sphm > 0.0) & (est > 0.0) & has_em
        else:
            nee_counted = jnp.zeros((th, tw), bool)
        ar = ar + jnp.where(nee_counted, 0.0, tr * em_r)
        ag = ag + jnp.where(nee_counted, 0.0, tg * em_g)
        ab = ab + jnp.where(nee_counted, 0.0, tb * em_b)

        # Fixed 7-draw schedule (models/physical.py:127-134).
        rng, u_transp = fk._uniform(rng)
        rng, u_lobe = fk._uniform(rng)
        rng, u1 = fk._uniform(rng)
        rng, u2 = fk._uniform(rng)
        rng, u_pick = fk._uniform(rng)
        rng, v1 = fk._uniform(rng)
        rng, v2 = fk._uniform(rng)

        choose_refr = u_transp < trn
        choose_diff = (~choose_refr) & (u_lobe < rgh)

        # refract (reference-tier physics, per-material IOR)
        ndot = dx * nx + dy * ny + dz * nz
        entering = ndot < 0.0
        eta = jnp.where(entering, 1.0 / ior, ior)
        rnx = jnp.where(entering, nx, -nx)
        rny = jnp.where(entering, ny, -ny)
        rnz = jnp.where(entering, nz, -nz)
        ni = rnx * dx + rny * dy + rnz * dz
        k_ = 1.0 - eta * eta * (1.0 - ni * ni)
        tirm = k_ < 0.0
        ksafe = jnp.where(tirm, 0.0, k_)
        coef = eta * ni + jnp.sqrt(ksafe)
        txx = jnp.where(tirm, 0.0, eta * dx - coef * rnx)
        txy = jnp.where(tirm, 0.0, eta * dy - coef * rny)
        txz = jnp.where(tirm, 0.0, eta * dz - coef * rnz)
        # mirror specular
        rfx = dx - 2.0 * ndot * nx
        rfy = dy - 2.0 * ndot * ny
        rfz = dz - 2.0 * ndot * nz
        # cosine-weighted diffuse about the geometric normal
        rdiff = jnp.sqrt(u1)
        phi_d = _TWO_PI * u2
        lx = rdiff * jnp.cos(phi_d)
        ly = rdiff * jnp.sin(phi_d)
        lz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        (tx_, ty_, tz_), (bx_, by_, bz_) = _onb(nx, ny, nz)
        ddx = lx * tx_ + ly * bx_ + lz * nx
        ddy = lx * ty_ + ly * by_ + lz * ny
        ddz = lx * tz_ + ly * bz_ + lz * nz

        ndx = jnp.where(choose_refr, txx, jnp.where(choose_diff, ddx, rfx))
        ndy = jnp.where(choose_refr, txy, jnp.where(choose_diff, ddy, rfy))
        ndz = jnp.where(choose_refr, txz, jnp.where(choose_diff, ddz, rfz))
        died = choose_refr & tirm
        tr = jnp.where(died, 0.0, tr)
        tg = jnp.where(died, 0.0, tg)
        tb = jnp.where(died, 0.0, tb)
        ndx = jnp.where(died, dx, ndx)
        ndy = jnp.where(died, dy, ndy)
        ndz = jnp.where(died, dz, ndz)

        ts = jnp.where(hitm, bt, 0.0)
        px = ox + ts * dx
        py = oy + ts * dy
        pz = oz + ts * dz
        offs = DEFAULT_EPS_OFFSET + EPS_OFFSET_SCALE * jnp.sqrt(
            px * px + py * py + pz * pz
        )
        sox = px + offs * nx
        soy = py + offs * ny
        soz = pz + offs * nz

        if nee:
            # pick the k-th emissive sphere, uniform among emitters
            kf = jnp.floor(u_pick * n_em_f).astype(jnp.int32)
            kk = jnp.clip(kf, 0, jnp.maximum(n_em - 1, 0))
            kk1 = kk  # e_idx = #{i : em_cum[i] <= k} (searchsorted-left)
            e_idx = jnp.zeros((th, tw), jnp.int32)

            def cum_body(i, e):
                return e + jnp.where(em_cum[i, 0] <= kk1, 1, 0)

            e_idx = jax.lax.fori_loop(0, n_sph, cum_body, e_idx)
            e_idx = jnp.clip(e_idx, 0, max(n_sph - 1, 0))

            cex = zero; cey = zero; cez = zero; rer = zero
            ler = zero; leg = zero; leb = zero

            def em_body(i, c):
                cex, cey, cez, rer, ler, leg, leb = c
                msk = e_idx == i
                return (
                    jnp.where(msk, sph_c[i, 0], cex),
                    jnp.where(msk, sph_c[i, 1], cey),
                    jnp.where(msk, sph_c[i, 2], cez),
                    jnp.where(msk, sph_r[i, 0], rer),
                    jnp.where(msk, le_sph[i, 0], ler),
                    jnp.where(msk, le_sph[i, 1], leg),
                    jnp.where(msk, le_sph[i, 2], leb),
                )

            cex, cey, cez, rer, ler, leg, leb = jax.lax.fori_loop(
                0, n_sph, em_body, (cex, cey, cez, rer, ler, leg, leb)
            )

            dcx_ = cex - sox
            dcy_ = cey - soy
            dcz_ = cez - soz
            d2 = dcx_ * dcx_ + dcy_ * dcy_ + dcz_ * dcz_
            dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
            wzx = dcx_ / dist
            wzy = dcy_ / dist
            wzz = dcz_ / dist
            sin2max = jnp.clip(rer * rer / jnp.maximum(d2, 1e-12), 0.0, 1.0)
            cosmax = jnp.sqrt(jnp.maximum(1.0 - sin2max, 0.0))
            outside = d2 > rer * rer
            cth = 1.0 - v1 * (1.0 - cosmax)
            sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
            phi = _TWO_PI * v2
            (tax, tay, taz), (bax, bay, baz) = _onb(wzx, wzy, wzz)
            cphi = sth * jnp.cos(phi)
            sphi = sth * jnp.sin(phi)
            omx = cphi * tax + sphi * bax + cth * wzx
            omy = cphi * tay + sphi * bay + cth * wzy
            omz = cphi * taz + sphi * baz + cth * wzz
            pdf_omega = 1.0 / jnp.maximum(_TWO_PI * (1.0 - cosmax), 1e-8)
            cos_surf = nx * omx + ny * omy + nz * omz

            # analytic hit distance on the sampled emitter — EXACT
            # replication of ops/intersect.ray_sphere_t (full-b quadratic,
            # 1e-30 sqrt guard): the visibility compare s_bt >= t_e*(1-1e-3)
            # sits on a knife edge for cone-rim grazing rays, so t_e must
            # round identically to the core path's.
            odd = omx * omx + omy * omy + omz * omz
            ocx_ = sox - cex
            ocy_ = soy - cey
            ocz_ = soz - cez
            be = 2.0 * (ocx_ * omx + ocy_ * omy + ocz_ * omz)
            cqe = ocx_ * ocx_ + ocy_ * ocy_ + ocz_ * ocz_ - rer * rer
            dete = be * be - 4.0 * odd * cqe
            vale = dete >= 0.0
            sqe = jnp.sqrt(jnp.where(vale, jnp.maximum(dete, 1e-30), 1.0))
            oinv2 = 0.5 / odd
            te1 = (-be - sqe) * oinv2
            te2 = (-be + sqe) * oinv2
            t_e = jnp.where(te1 >= 0.0, te1, jnp.where(te2 >= 0.0, te2, fk._INF))
            t_e = jnp.where(vale, t_e, fk._INF)

            s_bt = closest_t(sox, soy, soz, omx, omy, omz)
            visible = (
                (s_bt < fk._INF)
                & (s_bt >= t_e * (1.0 - 1e-3) - 1e-4)
                & (t_e < fk._INF)
            )
            valid = (
                hitm & choose_diff & has_em & outside
                & (cos_surf > 0.0) & visible
            )
            w = cos_surf / pdf_omega * n_em_f
            ar = ar + jnp.where(valid, tr * alb_r * _INV_PI * ler * w, 0.0)
            ag = ag + jnp.where(valid, tg * alb_g * _INV_PI * leg * w, 0.0)
            ab = ab + jnp.where(valid, tb * alb_b * _INV_PI * leb * w, 0.0)

        # continuing throughput (cos/pdf cancels for the diffuse lobe)
        tr = tr * alb_r
        tg = tg * alb_g
        tb = tb * alb_b

        side = jnp.where(ndx * nx + ndy * ny + ndz * nz >= 0.0, 1.0, -1.0)
        nox = px + offs * side * nx
        noy = py + offs * side * ny
        noz = pz + offs * side * nz

        # prev_diff for alive lanes (hit & survived); dead lanes' garbage
        # updates never matter — their throughput is zero.
        alive_now = hitm & ~died
        prevd = jnp.where(
            alive_now, jnp.where(choose_diff, 1.0, 0.0), prevd
        )
        return (nox, noy, noz, ndx, ndy, ndz, tr, tg, tb, ar, ag, ab, rng,
                prevd)

    def sample_body(s, acc):
        acc_r, acc_g, acc_b = acc
        sample = (s + sample_offset).astype(jnp.uint32)
        st = (
            pix * fk._u32(0x9E3779B9)
            ^ sample * fk._u32(0x85EBCA6B)
            ^ seed * fk._u32(0xC2B2AE35)
        )
        st, _ = fk._pcg(st)
        st, _ = fk._pcg(st)

        if jitter:
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

        state0 = (
            cam_ox, cam_oy, cam_oz,
            sdx, sdy, sdz,
            ones, ones, ones,
            zero, zero, zero,
            st, zero,
        )

        def w_cond(carry):
            b, s_ = carry
            return (b < max_bounces + 1) & (
                jnp.max(s_[6] + s_[7] + s_[8]) > 0.0
            )

        def w_body(carry):
            b, s_ = carry
            return b + 1, bounce(s_)

        _, out = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), state0))
        (_, _, _, _, _, _, tr, tg, tb, ar, ag, ab, _, _) = out
        # bounce budget exhausted -> sky
        ar = ar + tr * sky_r
        ag = ag + tg * sky_g
        ab = ab + tb * sky_b
        return (acc_r + ar, acc_g + ag, acc_b + ab)

    acc = jax.lax.fori_loop(0, spp, sample_body, (zero, zero, zero))
    inv = jnp.float32(1.0 / spp)
    out_ref[0] = acc[0] * inv
    out_ref[1] = acc[1] * inv
    out_ref[2] = acc[2] * inv


def _emitter_operands(scene: Scene):
    """Host-side emissive-sphere table: (cumulative emitter count (S,1)
    i32, premultiplied emitter radiance (S,3) f32, n_em scalar i32) —
    mirrors models/physical.py:96-98."""
    mats = scene.materials
    sph = scene.spheres
    em_mask = sph.active & (mats.emission_strength[sph.material] > 0.0)
    em_cum = jnp.cumsum(em_mask.astype(jnp.int32))
    n_em = jnp.sum(em_mask.astype(jnp.int32))
    le_sph = (
        mats.emission_color[sph.material]
        * mats.emission_strength[sph.material][:, None]
    )
    return em_cum[:, None], le_sph.astype(jnp.float32), n_em


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "spp", "max_bounces", "tile", "interpret", "rows",
        "jitter", "nee",
    ),
)
def render_physical_pallas(
    scene: Scene,
    camera: Camera,
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    seed,
    sample_offset=0,
    tile: tuple[int, int] = fk.DEFAULT_TILE,
    interpret: bool = False,
    row_start=0,
    rows: int | None = None,
    jitter: bool = True,
    nee: bool = True,
):
    """Physical-tier radiance image (rows, W, 3) f32 via the Pallas
    megakernel — the fast path for ``models/physical.render_physical``
    (identical estimator, identical RNG streams; interpreter-mode parity
    is pinned by tests/test_pallas_physical.py). Same sharding contract as
    ``render_pallas``: ``row_start``/``rows`` select a row block with
    global-index RNG."""
    rows = height if rows is None else rows
    th, tw = tile
    th = min(th, rows)
    tw = min(tw, width)
    if rows % th or width % tw:
        raise ValueError(f"{rows}x{width} not divisible by tile {th}x{tw}")
    interpret = interpret or jax.default_backend() != "tpu"

    kern = partial(
        _phys_kernel,
        th=th,
        tw=tw,
        n_sph=scene.num_spheres,
        n_tri=scene.num_triangles,
        n_mat=scene.num_materials,
        spp=spp,
        max_bounces=max_bounces,
        jitter=jitter,
        nee=nee,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    em_cum, le_sph, n_em = _emitter_operands(scene)
    par_i = jnp.stack(
        [jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
         jnp.asarray(sample_offset, jnp.int32),
         jnp.asarray(row_start, jnp.int32),
         n_em.astype(jnp.int32)]
    )[None, :]

    operands = fk._scene_operands(scene) + [
        em_cum,
        le_sph,
        fk._camera_params(camera, scene, height, width),
        par_i,
    ]
    out = pl.pallas_call(
        kern,
        grid=(rows // th, width // tw),
        in_specs=[smem() for _ in operands],
        out_specs=pl.BlockSpec(
            (3, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, rows, width), jnp.float32),
        interpret=interpret,
    )(*operands)
    return jnp.transpose(out, (1, 2, 0))
