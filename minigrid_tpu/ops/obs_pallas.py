"""Fused egocentric-window gather as one Pallas TPU kernel.

Why this exists (measured on TPU v5e, round 4): with the honest timing
protocol the vmapped one-hot window extraction (``core/obs.py
gather_view_onehot``) is **62.7 us of DoorKey-8x8's 110.6 us step** at
batch 4096 — 57% of the whole compiled program.  The root cause is layout:
under ``vmap`` every masked-reduce intermediate carries the tiny trailing
dims ``(H, 3)`` / ``(V, 3)`` on the (8, 128) vector-register tile, so each
VPU op moves ~40x its useful bytes.  This kernel flips the layout — the
env **batch rides the 128-lane axis** so every op is full-width — and
packs each (type, color, state) cell triple into one uint32 lane.

Per block of ``Bk`` envs (everything fully unrolled, zero control flow):

  stage 1   one-hot reduce over W:  ``rect1[i*H+h] = grid[(tx+i)*H+h]``
            as V*W selects on [H, Bk] row-slices;
  stage 2   column shift by ``top_y``: a barrel shifter —
            ceil(log2(V*H)) stages of static roll (two-slice concat)
            + per-lane bit select; wrapped rows land only on
            out-of-bounds view cells, which the next step stamps anyway;
  extract   V static row slices -> the unrotated [V*V, Bk] window;
  oob       grey-wall stamp (grid.py:139) from broadcasted-iota coords.

Rotation by ``agent_dir`` (grid.py:110-122: four static transforms + one
select) stays OUTSIDE the kernel in XLA, where it fuses with the
downstream vis/overlay/encode elementwise pipeline and the layout
transposes at the kernel boundary.

Reference semantics: minigrid_env.py:594-629 (slice + rotate),
grid.py:139 (out-of-bounds reads as grey wall).  Parity with every other
gather impl is asserted by tests/test_obs_impls.py over all directions x
poses (including out-of-bounds edges) and by the bench smoke gate.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C

_WALL_PACKED = (
    int(C.WALL_TRIPLE[0])
    | (int(C.WALL_TRIPLE[1]) << 8)
    | (int(C.WALL_TRIPLE[2]) << 16)
)

# 'auto' (pallas on TPU backends, vmap elsewhere) | 'pallas' | 'vmap'
OBS_IMPL = os.environ.get("MINIGRID_TPU_OBS_BATCH", "auto")

# Run the kernel through the Pallas interpreter (CPU-executable) — lets the
# CI parity suite exercise the exact kernel program without a TPU.
INTERPRET = os.environ.get("MINIGRID_TPU_PALLAS_INTERPRET", "0") == "1"

# Deliberately corrupt the kernel output (flip the type-field LSB of every
# cell).  Exists ONLY to prove the device kernel gate
# (tools/smoke.py::device_kernel_gate) actually refuses to bench a broken
# kernel — exercised by tests/test_tools.py.  Never set in production.
_SABOTAGE = os.environ.get("MINIGRID_TPU_OBS_SABOTAGE", "0") == "1"

# VMEM budget for the grid block: Bk lanes * W*H rows * 4 B, double-buffered
# by the pipeline.  4 MB leaves ample room in 16 MB VMEM.
_VMEM_GRID_BYTES = 4 * 1024 * 1024


def _roll_static(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Static circular roll along axis 0 (x'[r] = x[(r - s) mod N]) built
    from two slices + concat — works on every Mosaic version (pltpu.roll
    rejects some dtypes)."""
    n = x.shape[0]
    s = s % n
    if s == 0:
        return x
    return jnp.concatenate([x[n - s:], x[:n - s]], axis=0)


def _make_kernel(W: int, H: int, V: int, Bk: int):
    M = V * H
    n_bits = max(1, int(np.ceil(np.log2(M))))

    def kern(sc_ref, g_ref, o_ref):
        g = g_ref[:]  # [W*H, Bk] uint32, w-major h-minor
        tx = sc_ref[0:1, :]  # [1, Bk] int32
        ty = sc_ref[1:2, :]
        # stage 1: one-hot over w.  Out-of-range rows keep 0 (oob-stamped).
        parts = []
        for i in range(V):
            acc = jnp.zeros((H, Bk), jnp.uint32)
            for w in range(W):
                acc = jnp.where((tx + i) == w, g[w * H:(w + 1) * H, :], acc)
            parts.append(acc)
        rect1 = jnp.concatenate(parts, axis=0)  # [M, Bk]
        # stage 2: barrel shift by ty mod M.  In-bounds view cells always
        # read within their own H-row block; wraps/leaks only reach cells
        # the oob stamp overwrites.
        s = jnp.mod(ty, M)
        for k in range(n_bits):
            rect1 = jnp.where(
                ((s >> k) & 1) > 0, _roll_static(rect1, -(1 << k)), rect1
            )
        # extract rows i*H + j, j < V.  When V > H the last slices wrap
        # into appended copies of the leading rows (mod-M semantics).
        if (V - 1) * H + V > M:
            rect1 = jnp.concatenate([rect1, rect1[:V]], axis=0)
        view = jnp.concatenate(
            [rect1[i * H:i * H + V, :] for i in range(V)], axis=0
        )  # [V*V, Bk]
        rows = jax.lax.broadcasted_iota(jnp.int32, (V * V, Bk), 0)
        xs = tx + rows // V
        ys = ty + rows % V
        oob = (xs < 0) | (xs >= W) | (ys < 0) | (ys >= H)
        o_ref[:] = jnp.where(oob, jnp.uint32(_WALL_PACKED), view)

    return kern


def _block_lanes(B: int, W: int, H: int) -> int | None:
    """128-multiple divisor of B for the lane (batch) block; None if B
    isn't lane-tileable.

    Measured on v5e at B=4096: small grids are flat across Bk (8x8:
    85.1/83.7/84.6/85.4 us for 512/1024/2048/4096 within a timed scan)
    but big grids prefer SMALL blocks (25x25: 114.3 us at Bk=256 vs
    ~124 us at 512/1024) — more grid steps give the pipeline more
    load/compute overlap.  The VMEM budget is a hard cap on top."""
    target = 1024 if W * H <= 256 else 256
    cap = max(128, _VMEM_GRID_BYTES // (4 * W * H) // 128 * 128)
    bk = min(B, cap, target)
    while bk >= 128:
        if B % bk == 0:
            return bk
        bk -= 128
    return None


def pack_triples(cells: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 3] -> uint32[...]: type | color<<8 | state<<16."""
    c = cells.astype(jnp.uint32)
    return c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)


def unpack_triples(packed: jnp.ndarray) -> jnp.ndarray:
    """uint32[...] -> uint8[..., 3]."""
    return jnp.stack(
        [packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF],
        axis=-1,
    ).astype(jnp.uint8)


def gather_view_pallas_packed(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Batched rotated egocentric window over PACKED grids:
    uint32[B, W, H] -> uint32[B, V, V] (type | color<<8 | state<<16 per
    cell).  Since round 5 the grid STATE itself is packed (grid_ops.py), so
    the kernel consumes it directly — no pack preamble.

    The epilogue (transpose + rotation select) stays in the packed u32
    layout on purpose: rotating the unpacked uint8[B, V, V, 3] instead
    costs ~23 us more per step at batch 4096 (measured, v5e) because the
    trailing (V, 3) dims pad onto (32, 128) u8 vector tiles."""
    from minigrid_tpu.core.obs import _view_exts

    B, W, H = grid.shape
    V = view_size
    Bk = _block_lanes(B, W, H)
    assert Bk is not None, "batch not lane-tileable; use the vmap path"
    tx, ty = jax.vmap(lambda p, d: _view_exts(p, d, V))(agent_pos, agent_dir)
    gp = grid.astype(jnp.uint32).reshape(B, W * H).T  # [W*H, B]
    sc = jnp.stack(
        [tx, ty, agent_dir, jnp.zeros_like(tx)], axis=0
    )  # [4, B] int32
    out = pl.pallas_call(
        _make_kernel(W, H, V, Bk),
        grid=(B // Bk,),
        in_specs=[
            pl.BlockSpec((4, Bk), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (W * H, Bk), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (V * V, Bk), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((V * V, B), jnp.uint32),
        interpret=INTERPRET,
    )(sc, gp)
    if _SABOTAGE:  # gate-verification hook; see the flag's comment above
        out = out ^ jnp.uint32(1)
    rect = out.T.reshape(B, V, V)  # unrotated, packed
    # rotate_left^(dir+1): four static transforms + one select
    # (grid.py:110-122; d == 3 is the identity).
    f0 = rect[:, ::-1, :]
    f1 = rect[:, :, ::-1]
    d = agent_dir[:, None, None]
    return jnp.where(
        d == 0, jnp.swapaxes(f0, 1, 2),
        jnp.where(d == 1, f0[:, :, ::-1],
                  jnp.where(d == 2, jnp.swapaxes(f1, 1, 2), rect)))


def gather_view_pallas(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Batched rotated egocentric window, triple view: uint32[B, W, H]
    packed grid -> uint8[B, V, V, 3].  Semantics of ``vmap(gather_view)``
    (minigrid_env.py:594-629) in one kernel + fused XLA epilogue."""
    return unpack_triples(
        gather_view_pallas_packed(grid, agent_pos, agent_dir, view_size)
    )


def pallas_obs_available(num_envs: int, params) -> bool:
    """True when the fused kernel path applies: explicit/auto TPU backend
    and a lane-tileable batch."""
    if OBS_IMPL == "vmap":
        return False
    if OBS_IMPL != "pallas" and jax.default_backend() == "cpu":
        return False
    return _block_lanes(num_envs, params.width, params.height) is not None
