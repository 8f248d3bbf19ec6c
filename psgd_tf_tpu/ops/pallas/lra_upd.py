"""Fused LRA (UVd) update — two streaming Pallas kernels at the HBM bound.

The XLA path for `lra.update` (reference parity ref :554-617) issues
~10-13 separate passes over the (r, n) factors per update; measured on
v5e it runs 8-14x above the HBM traffic bound. One global reduction chain
(Grams -> rank-space solves -> stage coefficients) forces exactly two
streaming passes:

  stage 1 (reduce):  one pass over U, V, d, h, v -> all rank-space
      reductions at once: t = Vx, s = Ux, p = Uw, q = Vw, the Grams
      G = VU^T, Gu = UU^T, Gv = VV^T, the probe dots x.x/w.w/x.w, and
      max|U|, max|V| (for the 1%-probability rebalance).
  rank-space algebra (jnp, O(r^2)): the balance factors fold into the
      reductions as scalars (cu*cv = 1, so G is balance-invariant);
      Woodbury solves on the r x r system give every stage-3
      coefficient. No (r, n) data is touched.
  stage 3 (update): one pass -> U', V' via rank-vector outer products
      (the U-vs-V coin arrives as zeroed coefficients — branch-free
      masked update, SURVEY.md §7 hard part #3 — the balance as the
      cu/cv scale) and the UNSCALED d-gradient nablaD as a lane row.
      d' needs the global max|nablaD| BEFORE its factors rewrite —
      historically a separate streaming pass between the two above —
      but the scale is a SCALAR, so deferring it commutes with the
      elementwise rewrite: d' = d - mu_d * d * nablaD runs as one XLA
      AXPY (O(n) map, fused) after the max, and the whole (2nr + 3n)
      middle pass disappears (~25% of the update's traffic at r = 10).

Traffic: ~6nr + O(n) bytes (~8nr + O(n) with the fused apply) vs XLA's
measured ~50-120nr. Factors are rank-major (r, n) so the parameter axis
rides the lanes: every kernel op is a lane-broadcast/reduce (VPU) or an
(r, BLK) contraction (MXU). Mosaic-specific shapes: all n-vectors travel
as (1, n) rows; rank vectors pack as columns of small 2-D arrays
(scalar/1-D VMEM stores and 1-D dot operands don't lower).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLKN = 8192  # lanes per grid step
SUB = 8      # fp32 sublane quantum (Mosaic tile granularity; rank-major
             # factors are NOT rounded up to it in HBM — see _update_impl)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _dotg(a, b, dims):
    # default MXU precision throughout — matches the XLA baseline path,
    # whose Grams/projections are bf16 on TPU; interpret-mode (CPU tests)
    # is exact f32 either way
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ stage 1

def _stage1_kernel(uv_ref, d_ref, h_ref, vv_ref,
                   bigram_ref, maxs_ref, *, r):
    """ONE packed Gram per block: Z = [U; V; x; w], Z Z^T contains every
    rank-space reduction the update needs (Gu, G, Gv, s, p, t, q and the
    probe dots). A single MXU K-stream instead of 3 Grams + 2 projections
    — the kernel's cost driver, since skinny-matmul cost is ~K cycles
    regardless of M, N. U and V arrive PACKED as one (2r, B) block: two
    separate (r, n) arrays each round their sublane dim up to 8 in HBM
    (32 physical rows at r = 10), the packed array pays it once (24)."""
    first = pl.program_id(0) == 0
    uv = uv_ref[:]
    u, v = uv[:r], uv[r:]
    x = d_ref[:] * h_ref[:]          # (1, B)
    w = vv_ref[:] / d_ref[:]

    @pl.when(first)
    def _():
        bigram_ref[:] = jnp.zeros_like(bigram_ref)
        maxs_ref[:] = jnp.zeros_like(maxs_ref)

    z = jnp.concatenate([uv, x, w], axis=0)        # (2 r + 2, B)
    bigram_ref[:] += _dotg(z, z, (((1,), (1,))))

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    maxs_ref[:] = jnp.maximum(
        maxs_ref[:],
        jnp.where(
            lanes == 0, jnp.max(jnp.abs(u)),
            jnp.where(lanes == 1, jnp.max(jnp.abs(v)), 0.0),
        ),
    )


# ------------------------------------------------------------ probe images

def _probe_images(u, v, d, h, vv, coef):
    """Recompute (qh, b, nd) from the stage-1 rank-space coefficients.

    coef cols: 0 = t0 (Qh), 1 = cv*a1 (invQtv), 2 = cv*s2 (Ph), 3 = cu*a2.
    Projections are VPU broadcast-multiply + sublane reduce; an MXU dot
    here would K-stream 64 output tiles per projection and dominate the
    kernel. Stage 3 RECOMPUTES these from the coefficients instead of
    round-tripping 3 n-vectors through HBM — the inputs are re-streamed
    either way, so recomputation is free traffic.
    """
    x = d * h
    w = vv / d

    def proj(col, m):
        return jnp.sum(coef[:, col : col + 1] * m, axis=0, keepdims=True)

    qh = x + proj(0, u)
    b = w - proj(1, v)
    ph = d * (qh + proj(2, v))
    ipv = (b - proj(3, u)) / d
    nd = ph * h - vv * ipv
    return qh, b, nd


# ------------------------------------------------------------------ stage 3

def _stage3_kernel(uv_ref, d_ref, h_ref, vv_ref,
                   coef2_ref, coef_ref, scal_ref,
                   newuv_ref, nd_ref, *, r):
    uv = uv_ref[:]
    u, v = uv[:r], uv[r:]
    a, b, nd = _probe_images(u, v, d_ref[:], h_ref[:], vv_ref[:], coef2_ref)
    cu = scal_ref[0, 0]
    cv = scal_ref[0, 1]

    def col(j):  # (r, 1)
        return coef_ref[:, j : j + 1]

    def outer(cvec, row):  # (r,1) x (1,B) -> (r, B), VPU broadcast
        return cvec * row

    def proj(j, m):  # (r,1) . (r,B) -> (1, B), VPU reduce
        return jnp.sum(col(j) * m, axis=0, keepdims=True)

    # cols: 0 = e1, 1 = e2 (U update, mu-scaled; zero when updating V)
    #       2 = f1, 3 = f2 (V update, mu-scaled; zero when updating U)
    #       4 = g1, 5 = g2 (cv * atU', cv * btU' lane projections)
    av = a + proj(4, v)
    bv = b + proj(5, v)

    newu = cu * u - (outer(col(0), a) - outer(col(1), b))
    newv = cv * v - (outer(col(2), av) - outer(col(3), bv))
    newuv_ref[:] = jnp.concatenate([newu, newv], axis=0)
    # d' = d - mu_d d nablaD needs max|nablaD| over ALL lanes first; emit
    # the unscaled gradient row and let the caller's XLA AXPY finish it
    # (module docstring: this is what deleted the old stage-2 pass).
    nd_ref[:] = nd


# -------------------------------------------------- stages 3+4 with apply
# Fused update+apply: the optimizer preconditions the gradient right after
# the Q update, and the plain apply re-reads the just-written factors
# FOUR times (t1 = V'y; z = y + t1 U'; t2 = U'z; out = d'(z + t2 V')).
# Folding the apply's rank-space reductions into stage 3 (the new factors
# are already in VMEM) leaves ONE map pass: with y = d'g,
#   t1 = V'y, t2 = U'y + (U'U'^T) t1, out = d'(y + t1 U' + t2 V').

def _stage3_apply_kernel(uv_ref, d_ref, h_ref, vv_ref, g_ref,
                         coef2_ref, coef_ref, scal_ref,
                         newuv_ref, nd_ref, gram2_ref, *, r):
    first = pl.program_id(0) == 0
    uv = uv_ref[:]
    u, v = uv[:r], uv[r:]
    a, b, nd = _probe_images(u, v, d_ref[:], h_ref[:], vv_ref[:], coef2_ref)
    cu = scal_ref[0, 0]
    cv = scal_ref[0, 1]

    def col(j):
        return coef_ref[:, j : j + 1]

    av = a + jnp.sum(col(4) * v, axis=0, keepdims=True)
    bv = b + jnp.sum(col(5) * v, axis=0, keepdims=True)

    newu = cu * u - (col(0) * a - col(1) * b)
    newv = cv * v - (col(2) * av - col(3) * bv)
    newuv_ref[:] = jnp.concatenate([newu, newv], axis=0)
    nd_ref[:] = nd

    # packed apply Gram over Z2 = [U'; V'; y0; y1]: the apply vector is
    # y = d' g = (d - mu_d d nablaD) g = y0 - mu_d y1 with mu_d unknown
    # until the global max — every Gram block the apply needs (Gu', U'y,
    # V'y) is LINEAR in y, so the caller recombines the y0/y1 columns
    # with the known mu_d afterwards.
    y0 = d_ref[:] * g_ref[:]
    y1 = y0 * nd
    z2 = jnp.concatenate([newu, newv, y0, y1], axis=0)

    @pl.when(first)
    def _():
        gram2_ref[:] = jnp.zeros_like(gram2_ref)

    gram2_ref[:] += _dotg(z2, z2, ((1,), (1,)))


def _stage4_kernel(uv_ref, d_ref, g_ref, coef_ref, out_ref, *, r):
    """out = d' * (y + t1 U' + t2 V'); coef cols: 0 = t1, 1 = t2."""
    uv = uv_ref[:]
    y = d_ref[:] * g_ref[:]
    t1u = jnp.sum(coef_ref[:, 0:1] * uv[:r], axis=0, keepdims=True)
    t2v = jnp.sum(coef_ref[:, 1:2] * uv[r:], axis=0, keepdims=True)
    out_ref[:] = d_ref[:] * (y + t1u + t2v)


# ------------------------------------------------------------------ wrapper

def _identity(x):
    return x


def _update_impl(UV, d, v, h, step, key, tiny: float, interpret: bool,
                 psum=_identity, pmax=_identity, g=None,
                 stage1_combine=None):
    """The fused update over a (possibly device-local) block; UV is the
    packed (2r, n) factor array (U rows then V rows).

    `psum`/`pmax` reduce the rank-space quantities across a mesh axis when
    the parameter (lane) axis is sharded (fused_update_sharded); identity
    on a single device. All O(r^2) algebra between the streaming stages is
    computed redundantly per device — it never touches (r, n) data.

    With `g`, the preconditioned gradient P' g of the UPDATED state is
    computed in the same sweep (stage 3 accumulates the apply Gram, one
    extra map pass) and returned as a fourth output.
    """
    r2, n = UV.shape
    r = r2 // 2
    # NO rank padding in HBM: Mosaic pads partial (8, 128) tiles inside
    # VMEM for free, while materializing padded copies costs real HBM
    # traffic — at the reference's r = 10 a sublane-rounded rp = 16 was
    # measured to inflate every factor pass by 60% AND add full pad/unpad
    # copies (stage 1 alone: 586 us vs its ~140 us traffic at n = 1M).
    # U and V travel PACKED in one (2r, n) array for the same reason: two
    # (10, n) arrays tile to 32 physical sublanes, the packed one to 24.
    rp = r
    np_ = _cdiv(n, BLKN) * BLKN
    nb = np_ // BLKN
    f32 = jnp.float32
    padded = np_ != n

    if padded:
        def pad_rn(m):
            return jnp.zeros((r2, np_), f32).at[:, :n].set(m)

        def pad_n(x, fill=0.0):
            return jnp.full((1, np_), fill, f32).at[0, :n].set(x)

        UVp = pad_rn(UV)
        dp = pad_n(d, fill=1.0)  # 1-fill keeps w = v/d finite in the pad
        hp, vp = pad_n(h), pad_n(v)
        gp = pad_n(g) if g is not None else None
    else:
        UVp = UV
        dp, hp, vp = d[None, :], h[None, :], v[None, :]
        gp = g[None, :] if g is not None else None

    blk_uv = pl.BlockSpec((r2, BLKN), lambda i: (0, i), memory_space=pltpu.VMEM)
    blk_n = pl.BlockSpec((1, BLKN), lambda i: (0, i), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    # ---- stage 1: ONE packed Gram Z Z^T = every rank-space reduction
    zdim = 2 * rp + 2

    def _stage1(off, cnb):
        # index maps offset by `off` grid blocks: chunked calls stream
        # disjoint lane ranges of the SAME arrays (no slicing copies)
        c_uv = pl.BlockSpec(
            (r2, BLKN), lambda i: (0, i + off), memory_space=pltpu.VMEM
        )
        c_n = pl.BlockSpec(
            (1, BLKN), lambda i: (0, i + off), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(_stage1_kernel, r=r),
            grid=(cnb,),
            in_specs=[c_uv, c_n, c_n, c_n],
            out_specs=(rep((zdim, zdim)), rep((1, 8))),
            out_shape=(
                jax.ShapeDtypeStruct((zdim, zdim), f32),
                jax.ShapeDtypeStruct((1, 8), f32),
            ),
            interpret=interpret,
        )(UVp, dp, hp, vp)

    if stage1_combine is not None and nb >= 2:
        # pipelined path (fused_update_sharded(pipelined=True)): partial
        # Grams per lane chunk; the combiner ring-reduces chunk k with
        # ppermute hops that are independent of chunk k+1's launch, so
        # the scheduler can overlap exchange with streaming compute
        # (parallel/overlap.py).
        half = nb // 2
        parts = [_stage1(0, half), _stage1(half, nb - half)]
        bigram, maxs = stage1_combine(parts)
    else:
        bigram, maxs = _stage1(0, nb)
        bigram = psum(bigram)
        maxs = pmax(maxs)

    # unpack Z Z^T with Z = [U; V; x; w]
    iu, iv, ix, iw = slice(0, rp), slice(rp, 2 * rp), 2 * rp, 2 * rp + 1
    Gu = bigram[iu, iu]
    Gv = bigram[iv, iv]
    G = bigram[iv, iu]             # V U^T
    s0 = bigram[iu, ix]            # U x
    p0 = bigram[iu, iw]            # U w
    t0 = bigram[iv, ix]            # V x
    q0 = bigram[iv, iw]            # V w
    xx, ww, xw = bigram[ix, ix], bigram[iw, iw], bigram[ix, iw]
    maxU, maxV = maxs[0, 0], maxs[0, 1]

    # ---- balance coin (ref :562-567); cu*cv = 1 keeps G invariant
    k_bal, k_uv = jax.random.split(key)
    do_balance = jax.random.uniform(k_bal, dtype=f32) < 0.01
    rho = jnp.sqrt(maxU / maxV)
    cu = jnp.where(do_balance, 1.0 / rho, 1.0)
    cv = jnp.where(do_balance, rho, 1.0)

    # balanced rank-space quantities (primes)
    t, s, p, q = cv * t0, cu * s0, cu * p0, cv * q0
    Gup, Gvp_ = cu * cu * Gu, cv * cv * Gv  # G' = G

    # ---- Woodbury rank-space algebra (ref :574-579)
    eye = jnp.eye(rp, dtype=f32)
    IpVtU = eye + G
    a1 = jax.scipy.linalg.solve(IpVtU.T, p)
    a2 = jax.scipy.linalg.solve(IpVtU, q - Gvp_ @ a1)
    s2 = s + Gup @ t  # U' Qh

    # stage-2 coefficients on the RAW factors (balance absorbed into each
    # coefficient; note cu * t = cu * cv * t0 = t0 since cu * cv = 1)
    coef2 = jnp.stack([t0, cv * a1, cv * s2, cu * a2], axis=1)  # (rp, 4)
    coef2 = jnp.concatenate([coef2, jnp.zeros((rp, 4), f32)], axis=1)

    step = jnp.asarray(step, f32)

    # ---- rank-space dots of a = Qh and b = invQtv (no extra passes)
    aa = xx + 2.0 * (s @ t) + t @ (Gup @ t)
    bb = ww - 2.0 * (a1 @ q) + a1 @ (Gvp_ @ a1)
    # a.b = (x + t U').(w - a1 V'):
    #   x.(V'^T a1) = a1.(V'x) = a1.t ; (t U').w = t.(U'w) = t.p
    #   (t U').(a1 V') = t.((U'V'^T) a1) = t.(G^T a1)
    ab = xw - a1 @ t + t @ p - t @ (G.T @ a1)

    # update-U coefficients (ref :588-601)
    atV = t + G @ t
    btV = q - Gvp_ @ a1  # V'b = V'w - Gv' a1
    norm_u = jnp.sqrt(
        jnp.abs(
            aa * (atV @ (Gvp_ @ atV))
            + bb * (btV @ (Gvp_ @ btV))
            - 2.0 * ab * (atV @ (Gvp_ @ btV))
        )
    )
    mu_u = step / (norm_u + tiny)

    # update-V coefficients (ref :603-615)
    atU = s + Gup @ t          # U'a
    btU = p - G.T @ a1         # U'b = U'w - (U'V'^T) a1; U'V'^T = G^T
    norm_v = jnp.sqrt(
        jnp.abs(
            (atU @ (Gup @ atU)) * aa
            + (btU @ (Gup @ btU)) * bb
            - 2.0 * (atU @ (Gup @ btU)) * ab
        )
    )
    mu_v = step / (norm_v + tiny)

    update_u = jax.random.uniform(k_uv, dtype=f32) < 0.5
    zero = jnp.zeros((rp,), f32)
    e1 = jnp.where(update_u, mu_u * (IpVtU.T @ atV), zero)
    e2 = jnp.where(update_u, mu_u * (IpVtU.T @ btV), zero)
    f1 = jnp.where(update_u, zero, mu_v * atU)
    f2 = jnp.where(update_u, zero, mu_v * btU)
    g1 = cv * atU
    g2 = cv * btU
    coef3 = jnp.stack([e1, e2, f1, f2, g1, g2], axis=1)  # (rp, 6)
    coef3 = jnp.concatenate([coef3, jnp.zeros((rp, 2), f32)], axis=1)
    scal3 = jnp.zeros((1, 8), f32).at[0, 0].set(cu).at[0, 1].set(cv)

    if g is None:
        newUV, nd = pl.pallas_call(
            functools.partial(_stage3_kernel, r=r),
            grid=(nb,),
            in_specs=[blk_uv, blk_n, blk_n, blk_n,
                      rep((rp, 8)), rep((rp, 8)), rep((1, 8))],
            out_specs=(blk_uv, blk_n),
            out_shape=(
                jax.ShapeDtypeStruct((r2, np_), f32),
                jax.ShapeDtypeStruct((1, np_), f32),
            ),
            # UV -> UV' in place: without the alias XLA copies the new
            # factors into the training loop's scan carry every step
            # (the dense_big r5 finding; here 2 x 80MB at n=1M)
            input_output_aliases={0: 0},
            interpret=interpret,
        )(UVp, dp, hp, vp, coef2, coef3, scal3)

        # deferred d rewrite: one fused XLA map (pad lanes have nd = 0)
        mu_d = step / (pmax(jnp.max(jnp.abs(nd))) + tiny)
        newd = dp - mu_d * dp * nd

        if padded:
            return newUV[:, :n], newd[0, :n]
        return newUV, newd[0]

    # ---- stage 3 + apply-Gram accumulation, then the stage-4 map
    z2dim = 2 * rp + 2
    newUV, nd, gram2 = pl.pallas_call(
        functools.partial(_stage3_apply_kernel, r=r),
        grid=(nb,),
        in_specs=[blk_uv, blk_n, blk_n, blk_n, blk_n,
                  rep((rp, 8)), rep((rp, 8)), rep((1, 8))],
        out_specs=(blk_uv, blk_n, rep((z2dim, z2dim))),
        out_shape=(
            jax.ShapeDtypeStruct((r2, np_), f32),
            jax.ShapeDtypeStruct((1, np_), f32),
            jax.ShapeDtypeStruct((z2dim, z2dim), f32),
        ),
        input_output_aliases={0: 0},  # UV -> UV' in place (see above)
        interpret=interpret,
    )(UVp, dp, hp, vp, gp, coef2, coef3, scal3)
    gram2 = psum(gram2)
    mu_d = step / (pmax(jnp.max(jnp.abs(nd))) + tiny)
    newd = dp - mu_d * dp * nd     # deferred d rewrite (fused XLA map)

    # recombine the y0/y1 Gram columns with the now-known mu_d: y = y0 - mu_d y1
    iu2, iv2 = slice(0, rp), slice(rp, 2 * rp)
    iy0, iy1 = 2 * rp, 2 * rp + 1
    Gu2 = gram2[iu2, iu2]                                  # U' U'^T
    uy = gram2[iu2, iy0] - mu_d * gram2[iu2, iy1]          # U' y
    t1 = gram2[iv2, iy0] - mu_d * gram2[iv2, iy1]          # V' y
    t2 = uy + Gu2 @ t1             # U' (y + U'^T t1)
    coef4 = jnp.zeros((rp, 8), f32).at[:, 0].set(t1).at[:, 1].set(t2)

    pre = pl.pallas_call(
        functools.partial(_stage4_kernel, r=r),
        grid=(nb,),
        in_specs=[blk_uv, blk_n, blk_n, rep((rp, 8))],
        out_specs=blk_n,
        out_shape=jax.ShapeDtypeStruct((1, np_), f32),
        interpret=interpret,
    )(newUV, newd, gp, coef4)

    if padded:
        return newUV[:, :n], newd[0, :n], pre[0, :n]
    return newUV, newd[0], pre[0]


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update(UV, d, v, h, step, key, tiny: float, interpret: bool = False):
    """One LRA update matching groups.lra.update semantics exactly
    (including the rebalance and U-vs-V PRNG branch structure).

    UV: (2r, n) packed rank-major factors; d, v, h: (n,).
    Returns (UV', d')."""
    return _update_impl(UV, d, v, h, step, key, tiny, interpret)


def _ring_combine(axis: str, n_dev: int):
    """stage1_combine for the pipelined sharded update: ring-reduce each
    chunk's partial Gram/maxes with ppermute hops the scheduler can hide
    behind the next chunk's Pallas launch (parallel/overlap.py)."""
    from psgd_tf_tpu.parallel import overlap

    def combine(parts):
        grams = [overlap.ring_reduce(g, axis, n_dev) for g, _ in parts]
        maxes = [overlap.ring_max(m, axis, n_dev) for _, m in parts]
        bigram = grams[0]
        for g in grams[1:]:
            bigram = bigram + g
        maxs = maxes[0]
        for m in maxes[1:]:
            maxs = jnp.maximum(maxs, m)
        return bigram, maxs

    return combine


def fused_update_sharded(
    UV, d, v, h, step, key, tiny: float, mesh, axis: str = "shard",
    interpret: bool = False, pipelined: bool = False,
):
    """Mesh-sharded fused update: each device streams its own lane slice of
    the rank-major factors through the streaming Pallas stages; the
    rank-space reductions (the packed Gram Z Z^T, max|U|/|V|, max|nablaD|)
    psum/pmax over `axis` — the north-star "block-partitioned factors with
    ICI-reduced rank-space exchange" (SURVEY.md §2.4). The PRNG key
    replicates, so the rebalance and U-vs-V coins agree on every device and
    the result matches the single-device trajectory exactly (up to
    reduction order).

    `pipelined=True` computes the stage-1 Gram in lane chunks and
    ring-reduces each chunk over ppermute hops structurally independent of
    the next chunk's launch, letting the scheduler overlap the exchange
    with streaming compute (parallel/overlap.py; identical numerics, ring
    reduction order).

    Call inside jit under GSPMD: shard_map re-shards the operands to the
    lane split and hands back shard-annotated outputs.
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    r2, n = UV.shape
    n_pad = _cdiv(n, n_dev) * n_dev
    if n_pad != n:
        padv = lambda x, fill=0.0: jnp.full((n_pad,), fill, x.dtype).at[:n].set(x)
        UV = jnp.zeros((r2, n_pad), UV.dtype).at[:, :n].set(UV)
        d = padv(d, fill=1.0)  # 1-fill keeps w = v/d finite in the pad
        v, h = padv(v), padv(h)

    def local(UV, d, v, h, step, key):
        return _update_impl(
            UV, d, v, h, step, key, tiny, interpret,
            psum=functools.partial(jax.lax.psum, axis_name=axis),
            pmax=functools.partial(jax.lax.pmax, axis_name=axis),
            stage1_combine=_ring_combine(axis, n_dev) if pipelined else None,
        )

    row = P(None, axis)
    lane = P(axis)
    newUV, newd = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(row, lane, lane, lane, P(), P()),
        out_specs=(row, lane),
        check_vma=False,  # pallas_call is opaque to the replication checker
    )(UV, d, v, h, jnp.asarray(step, jnp.float32), key)
    if n_pad != n:
        return newUV[:, :n], newd[:n]
    return newUV, newd


@functools.partial(jax.jit, static_argnames=("tiny", "interpret"))
def fused_update_apply(UV, d, v, h, g, step, key, tiny: float,
                       interpret: bool = False):
    """One LRA update AND the preconditioned gradient P' g of the updated
    state in the same sweep (the optimizer's with-update branch): stage 3
    accumulates the apply Gram while the new factors are VMEM-resident,
    then one map pass — vs FOUR extra factor passes for a separate apply.

    Returns (UV', d', pre_grad)."""
    return _update_impl(UV, d, v, h, step, key, tiny, interpret, g=g)


def fused_update_apply_sharded(
    UV, d, v, h, g, step, key, tiny: float, mesh, axis: str = "shard",
    interpret: bool = False,
):
    """Mesh-sharded fused update+apply (see fused_update_sharded; the
    apply Gram joins the psum'd rank-space reductions)."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    r2, n = UV.shape
    n_pad = _cdiv(n, n_dev) * n_dev
    if n_pad != n:
        padv = lambda x, fill=0.0: jnp.full((n_pad,), fill, x.dtype).at[:n].set(x)
        UV = jnp.zeros((r2, n_pad), UV.dtype).at[:, :n].set(UV)
        d = padv(d, fill=1.0)
        v, h, g = padv(v), padv(h), padv(g)

    def local(UV, d, v, h, g, step, key):
        return _update_impl(
            UV, d, v, h, step, key, tiny, interpret,
            psum=functools.partial(jax.lax.psum, axis_name=axis),
            pmax=functools.partial(jax.lax.pmax, axis_name=axis),
            g=g,
        )

    row = P(None, axis)
    lane = P(axis)
    newUV, newd, pre = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(row, lane, lane, lane, lane, P(), P()),
        out_specs=(row, lane, lane),
        check_vma=False,
    )(UV, d, v, h, g, jnp.asarray(step, jnp.float32), key)
    if n_pad != n:
        return newUV[:, :n], newd[:n], pre[:n]
    return newUV, newd, pre
