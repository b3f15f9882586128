"""Fused Pallas TPU kernel for the batched 8100-action legal-move mask.

The XLA formulation in ``engine.env.legal_mask`` materializes ~15 [B, 8100]
intermediates in HBM (pseudo-move geometry, per-attacker-slot ray counts,
king-safety verdicts). At self-play batch sizes that is bandwidth-bound:
the mask costs ~5 us/board on a v5e even though it is only ~40 MFLOP of
one-hot matmuls. This kernel fuses the whole computation over a
(batch_tile, action_tile) grid so every intermediate lives in VMEM and HBM
sees only the small per-board precompute plus ONE [B, 8100] boolean write.

Semantics are identical to ``engine.env.legal_mask`` (which itself is
bit-exact vs the Python oracle and the reference implementation,
reference: training/game.py:441-490, training/cython_engine/game_core.pyx).
The per-board king-safety precompute (attacker slot compaction, palace
sub-pass) stays in XLA — it is [B, <=5x90]-sized and cheap; the wide
[B, 8100] phase runs in the kernel:

  - pseudo-legal geometry: piece value at FR/TO via one-hot MXU matmuls
    (board @ FROM1H), geometric blocker counts via occ @ BLOCK;
  - king safety for non-king moves: per attacker slot (2 rooks, 2 cannons,
    enemy king, 2 horses, 5 pawns), update the precomputed attack counts
    with the move's (from, to) deltas — between-row values at FR/TO come
    from btw_row @ FROM1H / TO1H matmuls;
  - king moves: destination safety gathered from the XLA palace sub-pass
    result (unsafe_sq @ TO1H).

All arithmetic is small-integer-valued (piece codes <= 7, blocker counts
<= 8): exact in bf16 matmuls with f32 accumulation, so the fused kernel is
bit-identical to the XLA path (tests/test_pallas_mask.py checks this in
interpreter mode; the TPU parity suite covers the compiled kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine import tables as _tables

NSQ = 90
ACTION_SPACE = NSQ * NSQ
_KPAD = 128          # padded square axis (matmul contraction dim)
_APAD = 8192         # padded action axis
_BT = 128            # batch tile
_AT = 1024           # action tile


@functools.lru_cache(maxsize=1)
def _const() -> dict:
    """Action-axis constant tables, padded to [_KPAD, _APAD] / [*, _APAD]."""
    t = _tables.tables()
    FR, TO = t["FR"], t["TO"]

    def one_hot_pad(idx: np.ndarray) -> np.ndarray:
        m = np.zeros((_KPAD, _APAD), np.float32)
        m[idx, np.arange(ACTION_SPACE)] = 1.0
        return m

    def pad_a(v: np.ndarray, dtype) -> np.ndarray:
        out = np.zeros(v.shape[:-1] + (_APAD,), dtype)
        out[..., :ACTION_SPACE] = v
        return out

    block = np.zeros((_KPAD, _APAD), np.float32)
    block[:NSQ, :ACTION_SPACE] = t["BLOCK"]

    # numpy-side dtype conversion + import-time materialization (bottom of
    # file): creating/converting device constants inside a jit trace would
    # cache leaked tracers. The per-(square, king) geometry (between rows,
    # alignment, horse legs, pawn attacks) needs NO tables — it is computed
    # arithmetically from row/col coordinates in _precompute_batch.
    bf16 = jnp.bfloat16.dtype
    c = {
        "FROM1H": jnp.asarray(one_hot_pad(FR).astype(bf16)),
        "TO1H": jnp.asarray(one_hot_pad(TO).astype(bf16)),
        "BLOCK": jnp.asarray(block.astype(bf16)),
        "FR_F": jnp.asarray(pad_a(FR.astype(np.float32), np.float32)[None]),
        "TO_F": jnp.asarray(pad_a(TO.astype(np.float32), np.float32)[None]),
        "KING_A": jnp.asarray(pad_a(t["KING_A"], np.float32)),
        "ADV_A": jnp.asarray(pad_a(t["ADV_A"], np.float32)),
        "ELE_A": jnp.asarray(pad_a(t["ELE_A"], np.float32)),
        "PAWN_A": jnp.asarray(pad_a(t["PAWN_A"], np.float32)),
        "HORSE_A": jnp.asarray(pad_a(t["HORSE_A"], np.float32)[None]),
        "ALIGNED_A": jnp.asarray(pad_a(t["ALIGNED_A"], np.float32)[None]),
        "PALV": jnp.asarray(t["PALACE_SQ"].astype(np.float32)),
    }
    return c


# --------------------------------------------------------------------------
# Per-board precompute (batched XLA; same logic as engine.env.legal_mask's
# attacker-slot compaction and palace sub-pass, but with every table lookup
# expressed as a one-hot contraction — TPU gathers at these shapes cost more
# than the whole wide phase)
# --------------------------------------------------------------------------


def _btw_rows(xs: jax.Array, ys: jax.Array) -> jax.Array:
    """BTW rows computed ARITHMETICALLY: out[..., z] = 1 iff z strictly
    between aligned squares xs and ys (xs/ys int32, broadcastable; output
    gains a trailing 90 axis). Bit-identical to the BTW table — 'between'
    is pure row/col arithmetic, so no [*, 90, 90] table materialization."""
    xr, xc = xs // 9, xs % 9
    yr, yc = ys // 9, ys % 9
    zr = jnp.arange(NSQ, dtype=jnp.int32) // 9
    zc = jnp.arange(NSQ, dtype=jnp.int32) % 9
    xr_, xc_ = xr[..., None], xc[..., None]
    yr_, yc_ = yr[..., None], yc[..., None]
    row = (
        (xr_ == yr_)
        & (zr == xr_)
        & (zc > jnp.minimum(xc_, yc_))
        & (zc < jnp.maximum(xc_, yc_))
    )
    col = (
        (xc_ == yc_)
        & (zc == xc_)
        & (zr > jnp.minimum(xr_, yr_))
        & (zr < jnp.maximum(xr_, yr_))
    )
    return (row | col).astype(jnp.float32)


def _aligned(xs: jax.Array, ys: jax.Array) -> jax.Array:
    """ALIGNED_SQ arithmetically: same rank xor same file (x != y)."""
    return ((xs // 9 == ys // 9) ^ (xs % 9 == ys % 9))


def _horse_geom(xs: jax.Array, ys: jax.Array):
    """(HORSE_PAIR, KLEG) arithmetically: attack geometry and leg square of
    a horse at xs against ys. Leg is meaningful only where geom is True
    (mirrors the KLEG table's zeros being unused outside HORSE_PAIR)."""
    dr = ys // 9 - xs // 9
    dc = ys % 9 - xs % 9
    adr, adc = jnp.abs(dr), jnp.abs(dc)
    geom = ((adr == 2) & (adc == 1)) | ((adr == 1) & (adc == 2))
    leg = jnp.where(adr == 2, xs + (dr // 2) * 9, xs + dc // 2)
    return geom, jnp.where(geom, leg, 0)


def _pawn_atk(si: jax.Array, ps: jax.Array, ys: jax.Array) -> jax.Array:
    """PAWN_ATK[1-si] arithmetically: does an ENEMY pawn at ps attack ys?
    (si is MY side index [B]; enemy pawns advance -1 when I am red.)"""
    fwd = jnp.where(si == 0, -1, 1)  # enemy pawn direction
    pr, pc = ps // 9, ps % 9
    yr, yc = ys // 9, ys % 9
    crossed = jnp.where(si == 0, pr <= 4, pr >= 5)
    return ((yr == pr + fwd) & (yc == pc)) | (
        crossed & (yr == pr) & (jnp.abs(yc - pc) == 1)
    )


def _precompute_batch(board: jax.Array, side: jax.Array) -> dict:
    """Small per-board arrays feeding the kernel. board int8[B, 90]."""
    C = _const()
    f32 = jnp.float32
    s32 = side.astype(jnp.int32)
    si = (s32 < 0).astype(jnp.int32)                      # [B] 0 red / 1 black
    bi = board.astype(jnp.int32)
    occ_f = (board != 0).astype(f32)                      # [B, 90]

    is_my_king = bi == s32[:, None]
    has_king = jnp.any(is_my_king, axis=-1)
    oh_k = is_my_king.astype(f32)                         # king one-hot [B,90]
    k = jnp.argmax(is_my_king, axis=-1).astype(jnp.int32)
    k_f = k.astype(f32)

    sq_iota = jnp.arange(NSQ, dtype=jnp.int32)

    def find_slots(kind, n):
        # iterated argmax: ~6x cheaper than top_k's custom call at [B, 90]
        m = (bi == (-s32 * kind)[:, None]).astype(f32)
        idxs, vals = [], []
        for _ in range(n):
            i = jnp.argmax(m, axis=1)
            v = jnp.max(m, axis=1)
            m = m - (sq_iota[None] == i[:, None]) * v[:, None]
            idxs.append(i.astype(jnp.int32))
            vals.append(v > 0.5)
        return jnp.stack(idxs, 1), jnp.stack(vals, 1)

    rk_i, rk_v = find_slots(5, 2)
    cn_i, cn_v = find_slots(6, 2)
    hs_i, hs_v = find_slots(4, 2)
    pw_i, pw_v = find_slots(7, 5)
    is_ek = bi == (-s32)[:, None]
    ek = jnp.argmax(is_ek, axis=-1).astype(jnp.int32)
    ek_v = jnp.any(is_ek, axis=-1)

    ray_s = jnp.concatenate([rk_i, cn_i, ek[:, None]], axis=1)   # [B, 5]
    ray_v = jnp.concatenate([rk_v, cn_v, ek_v[:, None]], axis=1)

    # per-(attacker, king) geometry — ALL arithmetic (see helpers above);
    # the former one-hot table contractions materialized a [B, 90, 90]
    # between-table slice per board (~42% of total mask time at batch 8k)
    btw = _btw_rows(ray_s, k[:, None])                    # [B, 5, 90]
    cnt0 = jnp.einsum("bsz,bz->bs", btw, occ_f)
    ray_pre = ray_v & _aligned(ray_s, k[:, None])

    geom_hk, leg_hk = _horse_geom(hs_i, k[:, None])
    hs_geom = hs_v & geom_hk
    hs_leg = leg_hk.astype(f32)                           # f32 square values
    iota_f = jnp.arange(NSQ, dtype=f32)
    oh_leg = (hs_leg[..., None] == iota_f).astype(f32)
    hs_locc = jnp.einsum("bhz,bz->bh", oh_leg, occ_f)
    pw_pre = pw_v & _pawn_atk(si[:, None], pw_i, k[:, None])

    # ---- palace sub-pass: safety of the 9 king destinations -------------
    # Between-counts contract the ARITHMETIC between-rows against
    # (occ - king); geometry (alignment, horse legs, pawn reach) is the same
    # row/col arithmetic as the main pass. NO gathers anywhere — measured
    # take_along_axis on [B, 90] rows costs ~5 ms at batch 8k on v5e.
    ray_want = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0], f32)
    ray_s_f = ray_s.astype(f32)
    hs_i_f = hs_i.astype(f32)
    pw_i_f = pw_i.astype(f32)
    occ2 = occ_f - oh_k                                   # king vacates k

    def pal_side(sidx: int) -> jax.Array:
        palv = C["PALV"][sidx]                                    # [9] f32
        pal_i = palv.astype(jnp.int32)
        btw_pal = _btw_rows(ray_s[:, :, None], pal_i[None, None, :])
        cntpp = jnp.einsum("bsjz,bz->bsj", btw_pal, occ2)
        alg = _aligned(ray_s[:, :, None], pal_i[None, None, :])
        up = jnp.any(
            ray_v[:, :, None]
            & alg
            & (palv[None, None, :] != ray_s_f[:, :, None])
            & (cntpp == ray_want[None, :, None]),
            axis=1,
        )
        pgeom, pleg_i = _horse_geom(hs_i[:, :, None], pal_i[None, None, :])
        pleg = pleg_i.astype(f32)
        oh_pleg = (pleg[..., None] == iota_f).astype(f32)
        locc_leg = jnp.einsum("bhjz,bz->bhj", oh_pleg, occ_f)
        ploccp = jnp.where(
            pleg == palv[None, None, :],
            1.0,
            jnp.where(pleg == k_f[:, None, None], 0.0, locc_leg),
        )
        up |= jnp.any(
            hs_v[:, :, None]
            & pgeom
            & (palv[None, None, :] != hs_i_f[:, :, None])
            & (ploccp == 0.0),
            axis=1,
        )
        ppa = _pawn_atk(
            si[:, None, None], pw_i[:, :, None], pal_i[None, None, :]
        )
        up |= jnp.any(
            pw_v[:, :, None]
            & ppa
            & (palv[None, None, :] != pw_i_f[:, :, None]),
            axis=1,
        )
        return up                                                  # [B, 9]

    black = (si == 1)[:, None]
    unsafe_pal = jnp.where(black, pal_side(1), pal_side(0))
    palv_b = jnp.where(black, C["PALV"][1][None], C["PALV"][0][None])  # [B,9]
    oh_pal = (palv_b[..., None] == iota_f).astype(f32)
    unsafe_sq = jnp.einsum("bj,bjz->bz", unsafe_pal.astype(f32), oh_pal)

    padk = lambda v: jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, _KPAD - NSQ)])  # noqa: E731
    bf16 = jnp.bfloat16
    return {
        "board": padk(board.astype(bf16)),
        "occ": padk(occ_f.astype(bf16)),
        "btw": padk(btw.astype(bf16)),
        "cnt0": cnt0,
        "ray_s": ray_s_f,
        "ray_pre": ray_pre.astype(f32),
        "hs_i": hs_i_f,
        "hs_geom": hs_geom.astype(f32),
        "hs_leg": hs_leg,
        "hs_locc": hs_locc,
        "pw_i": pw_i_f,
        "pw_pre": pw_pre.astype(f32),
        "unsafe_sq": padk(unsafe_sq.astype(bf16)),
        "scal": jnp.stack(
            [side.astype(f32), si.astype(f32), k_f, has_king.astype(f32)],
            axis=1,
        ),
    }


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

_RAY_WANT = (0.0, 0.0, 1.0, 1.0, 0.0)  # 2 rooks, 2 cannons, enemy king


def _kernel(
    board_ref, occ_ref, btw_ref, cnt0_ref, ray_s_ref, ray_pre_ref,
    hs_i_ref, hs_geom_ref, hs_leg_ref, hs_locc_ref, pw_i_ref, pw_pre_ref,
    unsafe_sq_ref, scal_ref,
    from1h_ref, to1h_ref, block_ref, fr_ref, to_ref,
    king_a_ref, adv_a_ref, ele_a_ref, pawn_a_ref, horse_a_ref, aligned_a_ref,
    out_ref,
):
    f32 = jnp.float32

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    from1h = from1h_ref[:]
    to1h = to1h_ref[:]

    pf = dot(board_ref[:], from1h)           # [Bt, At] piece value at FR
    pt = dot(board_ref[:], to1h)             # piece value at TO
    blk = dot(occ_ref[:], block_ref[:])      # geometric blocker count

    side = scal_ref[:, 0:1]                  # [Bt, 1]
    si = scal_ref[:, 1:2]
    k = scal_ref[:, 2:3]
    has_king = scal_ref[:, 3:4] > 0.5

    spf = pf * side
    spt = pt * side
    own_t = spt > 0.5
    enemy_t = spt < -0.5
    occ_t = jnp.abs(pt) > 0.5
    b0 = blk < 0.5
    b1 = (blk > 0.5) & (blk < 1.5)

    def side_row(ref):
        return ref[0:1, :] * (1.0 - si) + ref[1:2, :] * si  # [Bt, At]

    pseudo = (
        ((spf == 1.0) & (side_row(king_a_ref) > 0.5))
        | ((spf == 2.0) & (side_row(adv_a_ref) > 0.5))
        | ((spf == 3.0) & (side_row(ele_a_ref) > 0.5) & b0)
        | ((spf == 4.0) & (horse_a_ref[0:1, :] > 0.5) & b0)
        | ((spf == 5.0) & (aligned_a_ref[0:1, :] > 0.5) & b0)
        | ((spf == 7.0) & (side_row(pawn_a_ref) > 0.5))
    ) & ~own_t
    pseudo |= (
        (spf == 6.0)
        & (aligned_a_ref[0:1, :] > 0.5)
        & ((b0 & ~occ_t) | (b1 & enemy_t))
    )

    fr_row = fr_ref[:]                       # [1, At]
    to_row = to_ref[:]

    # ---- king-safety for non-king moves (attacker-slot updates) ---------
    unsafe = jnp.zeros_like(pf, dtype=bool)
    zero = jnp.zeros_like(pf)
    for s in range(5):  # 2 rooks, 2 cannons, enemy king
        btw_f = dot(btw_ref[s], from1h)      # between-row value at FR
        btw_t = dot(btw_ref[s], to1h)
        cntp = cnt0_ref[:, s : s + 1] - btw_f + jnp.where(occ_t, zero, btw_t)
        unsafe |= (
            (ray_pre_ref[:, s : s + 1] > 0.5)
            & (to_row != ray_s_ref[:, s : s + 1])
            & (cntp == _RAY_WANT[s])
        )
    for s in range(2):  # horses: leg occupancy after the move
        leg = hs_leg_ref[:, s : s + 1]
        loccp = jnp.where(
            to_row == leg,
            1.0,
            jnp.where(fr_row == leg, 0.0, hs_locc_ref[:, s : s + 1]),
        )
        unsafe |= (
            (hs_geom_ref[:, s : s + 1] > 0.5)
            & (to_row != hs_i_ref[:, s : s + 1])
            & (loccp == 0.0)
        )
    for s in range(5):  # pawns: contact attacks are move-invariant
        unsafe |= (pw_pre_ref[:, s : s + 1] > 0.5) & (
            to_row != pw_i_ref[:, s : s + 1]
        )

    # ---- king moves: palace destination safety --------------------------
    king_unsafe = dot(unsafe_sq_ref[:], to1h) > 0.5
    # logical compose, not select: Mosaic rejects select over i1 vectors
    is_king_move = fr_row == k
    bad = (is_king_move & king_unsafe) | (~is_king_move & unsafe)

    # int8 store: Mosaic rejects 1-bit truncating stores on some targets
    out_ref[:] = (pseudo & ~bad & has_king).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def legal_mask_pallas(
    board: jax.Array, side: jax.Array, interpret: bool = False
) -> jax.Array:
    """Batched legal mask bool[B, 8100] for int8 boards [B, 90].

    TPU path of ``engine.env.legal_mask_batch``. ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU) for parity tests.
    """
    C = _const()
    b = board.shape[0]
    bp = -(-b // _BT) * _BT

    pre = _precompute_batch(board, side)
    if bp != b:
        pre = jax.tree.map(
            lambda x: jnp.pad(x, [(0, bp - b)] + [(0, 0)] * (x.ndim - 1)), pre
        )
    btw5 = jnp.swapaxes(pre["btw"], 0, 1)  # [5, Bp, 128]

    grid = (bp // _BT, _APAD // _AT)
    bspec = lambda *blk: pl.BlockSpec(  # noqa: E731
        blk, lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    aspec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, _AT), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            bspec(_BT, _KPAD),                       # board
            bspec(_BT, _KPAD),                       # occ
            pl.BlockSpec(
                (5, _BT, _KPAD),
                lambda i, j: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),                                        # btw5
            bspec(_BT, 5),                            # cnt0
            bspec(_BT, 5),                            # ray_s
            bspec(_BT, 5),                            # ray_pre
            bspec(_BT, 2),                            # hs_i
            bspec(_BT, 2),                            # hs_geom
            bspec(_BT, 2),                            # hs_leg
            bspec(_BT, 2),                            # hs_locc
            bspec(_BT, 5),                            # pw_i
            bspec(_BT, 5),                            # pw_pre
            bspec(_BT, _KPAD),                        # unsafe_sq
            bspec(_BT, 4),                            # scal
            pl.BlockSpec((_KPAD, _AT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_KPAD, _AT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_KPAD, _AT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            aspec(1),                                 # FR_F
            aspec(1),                                 # TO_F
            aspec(2),                                 # KING_A
            aspec(2),                                 # ADV_A
            aspec(2),                                 # ELE_A
            aspec(2),                                 # PAWN_A
            aspec(1),                                 # HORSE_A
            aspec(1),                                 # ALIGNED_A
        ],
        out_specs=pl.BlockSpec(
            (_BT, _AT), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, _APAD), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pre["board"], pre["occ"], btw5, pre["cnt0"], pre["ray_s"],
        pre["ray_pre"], pre["hs_i"], pre["hs_geom"], pre["hs_leg"],
        pre["hs_locc"], pre["pw_i"], pre["pw_pre"], pre["unsafe_sq"],
        pre["scal"],
        C["FROM1H"], C["TO1H"], C["BLOCK"], C["FR_F"], C["TO_F"],
        C["KING_A"], C["ADV_A"], C["ELE_A"], C["PAWN_A"], C["HORSE_A"],
        C["ALIGNED_A"],
    )
    return out[:b, :ACTION_SPACE] > 0


# Materialize device constants at import time (outside any trace).
_const()
