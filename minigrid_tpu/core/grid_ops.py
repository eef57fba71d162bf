"""Functional grid-construction ops over the PACKED grid representation.

The reference builds levels by mutating a Grid object (wall builders
grid.py:80-108, ``put_obj``/``place_obj`` minigrid_env.py:312-380).  Here every
builder is a pure array op.  Positions are often *traced* values (sampled with
``jax.random``), so line/rect builders are expressed as coordinate-mask
``where`` writes instead of Python-loop scatters.

**Packed representation (round 5).**  A grid is ``uint32[W, H]`` with each
cell's reference (type, color, state) triple (grid.py:244-268) packed into
one word: ``type | color << 8 | state << 16`` — the same packing the round-4
Pallas obs kernel introduced for the egocentric window.  Why: a
``uint8[W, H, 3]`` tensor puts the 3-wide triple on the 128-lane axis of
every TPU vector tile, so the pooled auto-reset's per-step state selects
move up to ~40x their useful bytes; packed u32 cells measured 3.4x faster
on 25x25 grids (one batched consume select: 82.7 -> 24.4 us/step at
B=4096, v5e).  The builder API still speaks triples — ``pack_cells`` /
``unpack_cells`` convert at the boundary, and everything between stays
one-word bit math.

``place_obj``'s rejection-sampling loop (minigrid_env.py:338-363) is replaced
by its statistical fixed point: a single masked-categorical draw uniform over
currently-free cells.  One RNG draw, no divergence across a vmapped batch, and
identical distribution whenever the reject region is static (exact RNG-stream
parity with numpy lives in the host-side parity generators instead).
"""

from __future__ import annotations

import jax
import numpy as np

import jax.numpy as jnp

from minigrid_tpu.core import constants as C

_EMPTY = np.asarray(C.EMPTY_TRIPLE)
_WALL = np.asarray(C.WALL_TRIPLE)
_EMPTY_T = C.OBJECT_TO_IDX["empty"]


def pack_cells(cells) -> jnp.ndarray:
    """(..., 3) triples (uint8/int) -> packed uint32[...]:
    type | color<<8 | state<<16."""
    c = jnp.asarray(cells).astype(jnp.uint32)
    return c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)


def unpack_cells(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint32[...] -> uint8[..., 3] (type, color, state)."""
    p = jnp.asarray(packed)
    return jnp.stack(
        [p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
    ).astype(jnp.uint8)


def pack_np(cells: np.ndarray) -> np.ndarray:
    """Host-side pack: numpy (..., 3) -> uint32[...]."""
    c = np.asarray(cells).astype(np.uint32)
    return c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)


def unpack_np(packed: np.ndarray) -> np.ndarray:
    """Host-side unpack: numpy uint32[...] -> uint8[..., 3]."""
    p = np.asarray(packed)
    return np.stack(
        [p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)


def types(grid: jnp.ndarray) -> jnp.ndarray:
    """int32[...] type ids of packed cells."""
    return (grid & 0xFF).astype(jnp.int32)


def colors(grid: jnp.ndarray) -> jnp.ndarray:
    """int32[...] color ids of packed cells."""
    return ((grid >> 8) & 0xFF).astype(jnp.int32)


def states(grid: jnp.ndarray) -> jnp.ndarray:
    """int32[...] door-state field of packed cells."""
    return ((grid >> 16) & 0xFF).astype(jnp.int32)


def coords(width: int, height: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Broadcast (W, H) x / y index planes."""
    xs = jax.lax.broadcasted_iota(jnp.int32, (width, height), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (width, height), 1)
    return xs, ys


def set_where(grid: jnp.ndarray, mask: jnp.ndarray, triple: jnp.ndarray) -> jnp.ndarray:
    """Write `triple` (a (..., 3) cell triple; packed internally) at every
    cell where mask is True."""
    return jnp.where(mask, pack_cells(triple), grid)


def put(grid: jnp.ndarray, x, y, triple) -> jnp.ndarray:
    """put_obj (minigrid_env.py:373-380) — single-cell write, dynamic coords ok.

    Written as a broadcast-compare masked select, not a scatter: a vmapped
    one-cell scatter lowers to a serialized kCustom kernel that breaks fusion
    (measured ~86us per scatter at batch 4096 on TPU v5e), while a select
    fuses with surrounding generator ops."""
    w, h = grid.shape[:2]
    xs, ys = coords(w, h)
    mask = (xs == x) & (ys == y)
    return set_where(grid, mask, triple)


def take1(vec: jnp.ndarray, i) -> jnp.ndarray:
    """One dynamic element of a small 1-D array as a masked reduce — a
    vmapped 1-element gather lowers to a serialized kCustom kernel
    (~86 us per launch at batch 4096 on v5e; in a fused auto-reset path
    one stray gather measured as ~90% of GoToDoor's step, PERF.md r5)."""
    n = vec.shape[0]
    return jnp.sum(jnp.where(jnp.arange(n) == i, vec, 0))


def take_row(mat: jnp.ndarray, i) -> jnp.ndarray:
    """Row ``mat[i]`` of a small [n, ...] array as a masked reduce (see
    :func:`take1` for why this is not a dynamic gather)."""
    n = mat.shape[0]
    hot = (jnp.arange(n) == i).reshape((n,) + (1,) * (mat.ndim - 1))
    return jnp.sum(jnp.where(hot, mat, 0), axis=0).astype(mat.dtype)


def take_vec(vec: jnp.ndarray, idxs: jnp.ndarray) -> jnp.ndarray:
    """``vec[idxs]`` for a small 1-D table and a small index vector, as a
    one-hot masked reduce (see :func:`take1`)."""
    n = vec.shape[0]
    eq = jnp.arange(n)[None, :] == idxs[..., None]
    return jnp.sum(jnp.where(eq, vec[None, :], 0), axis=-1).astype(vec.dtype)


def read_word(grid: jnp.ndarray, x, y) -> jnp.ndarray:
    """Single-cell read as a masked reduce (a vmapped one-cell gather lowers
    to a serialized kCustom kernel — see :func:`put`).  Returns the packed
    uint32 word at (x, y); coords must be in bounds."""
    w, h = grid.shape[:2]
    xs, ys = coords(w, h)
    m = (xs == x) & (ys == y)
    return jnp.max(jnp.where(m, grid, jnp.uint32(0)), axis=(0, 1))


def read_cell(grid: jnp.ndarray, x, y) -> jnp.ndarray:
    """Single-cell read; returns the (3,) uint8 triple at (x, y)."""
    return unpack_cells(read_word(grid, x, y))


def put_if(grid: jnp.ndarray, x, y, triple, enabled=True) -> jnp.ndarray:
    """Conditional single-cell write as a fused masked select (see
    :func:`put` for why this is not a scatter).  ``enabled`` may be traced;
    when False the grid passes through unchanged."""
    w, h = grid.shape[:2]
    xs, ys = coords(w, h)
    mask = (xs == x) & (ys == y) & jnp.asarray(enabled)
    return set_where(grid, mask, triple)


def horz_wall(grid: jnp.ndarray, x, y, length=None, triple=None) -> jnp.ndarray:
    """grid.horz_wall (grid.py:80-90); length=None -> to the right edge."""
    w, h = grid.shape[:2]
    if length is None:
        length = w - x
    triple = _WALL if triple is None else triple
    xs, ys = coords(w, h)
    mask = (ys == y) & (xs >= x) & (xs < x + length)
    return set_where(grid, mask, triple)


def vert_wall(grid: jnp.ndarray, x, y, length=None, triple=None) -> jnp.ndarray:
    """grid.vert_wall (grid.py:92-102); length=None -> to the bottom edge."""
    w, h = grid.shape[:2]
    if length is None:
        length = h - y
    triple = _WALL if triple is None else triple
    xs, ys = coords(w, h)
    mask = (xs == x) & (ys >= y) & (ys < y + length)
    return set_where(grid, mask, triple)


def wall_rect(grid: jnp.ndarray, x, y, rw, rh, triple=None) -> jnp.ndarray:
    """grid.wall_rect (grid.py:104-108) — rectangle outline of walls."""
    w, h = grid.shape[:2]
    triple = _WALL if triple is None else triple
    xs, ys = coords(w, h)
    inside = (xs >= x) & (xs < x + rw) & (ys >= y) & (ys < y + rh)
    border = inside & (
        (xs == x) | (xs == x + rw - 1) | (ys == y) | (ys == y + rh - 1)
    )
    return set_where(grid, border, triple)


def is_empty(grid: jnp.ndarray) -> jnp.ndarray:
    """(W, H) mask of cells encoding None (grid.py:261: empty == (1, 0, 0))."""
    return (grid & 0xFF) == _EMPTY_T


def rect_mask(
    width: int, height: int, top: tuple, size: tuple
) -> jnp.ndarray:
    """Mask of the place_obj search rectangle (minigrid_env.py:328-349):
    top clamped at 0, extent clamped to the grid."""
    xs, ys = coords(width, height)
    tx = jnp.maximum(jnp.asarray(top[0], jnp.int32), 0)
    ty = jnp.maximum(jnp.asarray(top[1], jnp.int32), 0)
    return (
        (xs >= tx)
        & (xs < jnp.minimum(tx + size[0], width))
        & (ys >= ty)
        & (ys < jnp.minimum(ty + size[1], height))
    )


def sample_cell(key: jnp.ndarray, mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform draw over True cells of a (W, H) mask.

    Returns (pos int32[2], ok bool).  ok is False when the mask is empty (the
    analogue of place_obj exhausting max_tries, minigrid_env.py:341-342) — in
    that case pos is (0, 0) and callers must mask out the write.
    """
    w, h = mask.shape
    flat = mask.reshape(-1)
    # Count-and-select: draw r uniform in [0, count) and take the (r+1)-th
    # True cell.  One integer draw and a cumsum — no Gumbel transcendentals,
    # which dominate generation cost at fleet batch sizes.
    counts = jnp.cumsum(flat.astype(jnp.int32))
    total = counts[-1]
    any_valid = total > 0
    r = jax.random.randint(key, (), 0, jnp.maximum(total, 1))
    idx = jnp.argmax(counts > r)
    pos = jnp.stack([idx // h, idx % h]).astype(jnp.int32)
    return jnp.where(any_valid, pos, jnp.zeros_like(pos)), any_valid


def sample_two_distinct(
    key: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two distinct uniform cells from one mask with a single cumsum pass
    (fuses back-to-back place_obj draws over the same free region).
    Returns (pos1, pos2, ok)."""
    w, h = mask.shape
    flat = mask.reshape(-1)
    counts = jnp.cumsum(flat.astype(jnp.int32))
    total = counts[-1]
    ok = total >= 2
    k1, k2 = jax.random.split(key)
    r1 = jax.random.randint(k1, (), 0, jnp.maximum(total, 1))
    r2 = jax.random.randint(k2, (), 0, jnp.maximum(total - 1, 1))
    r2 = r2 + (r2 >= r1)
    i1 = jnp.argmax(counts > r1)
    i2 = jnp.argmax(counts > r2)
    p1 = jnp.stack([i1 // h, i1 % h]).astype(jnp.int32)
    p2 = jnp.stack([i2 // h, i2 % h]).astype(jnp.int32)
    return p1, p2, ok


def place_obj(
    key: jnp.ndarray,
    grid: jnp.ndarray,
    triple,
    agent_pos: jnp.ndarray | None = None,
    top: tuple = (0, 0),
    size: tuple | None = None,
    reject_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """place_obj (minigrid_env.py:312-371) as one masked draw.

    Placement is uniform over cells that are empty, not the agent's, inside
    the (top, size) rectangle, and not rejected.  Returns (grid', pos, ok).
    Pass triple=None to reserve a cell without writing (place_agent path,
    minigrid_env.py:382-394).
    """
    w, h = grid.shape[:2]
    if size is None:
        size = (w, h)
    mask = is_empty(grid) & rect_mask(w, h, top, size)
    if agent_pos is not None:
        xs, ys = coords(w, h)
        mask &= ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    if reject_mask is not None:
        mask &= ~reject_mask
    pos, ok = sample_cell(key, mask)
    if triple is not None:
        xs, ys = coords(w, h)
        write = (xs == pos[0]) & (ys == pos[1]) & ok
        grid = set_where(grid, write, triple)
    return grid, pos, ok
