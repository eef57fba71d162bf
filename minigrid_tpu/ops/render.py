"""Device-side RGB rendering as a texture-atlas gather.

The reference rasterizes tiles on demand with per-pixel Python loops behind a
dict cache (``Grid.render_tile``, grid.py:145-198).  Here the entire tile
space — (type × color × state) × (no-agent | 4 agent directions) ×
(plain | highlighted) — is rasterized ONCE on the host into a dense texture
atlas, and a frame render compiles to a single gather + transpose on device:

    frame[j*T:(j+1)*T, i*T:(i+1)*T] = atlas[variant(i,j), code(i,j)]

Highlight variants are rasterized at supersample resolution before the
downsample (grid.py:189-193), so tiles are pixel-exact vs the reference.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.obs import gen_obs_grid, view_world_coords
from minigrid_tpu.core.state import EnvParams, EnvState
from minigrid_tpu.utils import rendering as R

NUM_CODES = C.NUM_OBJECT_TYPES * C.NUM_COLORS * 3  # 34 * 11 * 3
NUM_VARIANTS = 10  # (plain | highlight) x (none | 4 agent dirs)

_atlas_cache: dict[int, jnp.ndarray] = {}


def _build_atlas_np(tile_size: int, subdivs: int = 3) -> np.ndarray:
    """(NUM_VARIANTS, NUM_CODES, T, T, 3) uint8 texture atlas."""
    ss = tile_size * subdivs
    atlas = np.zeros((NUM_VARIANTS, NUM_CODES, tile_size, tile_size, 3),
                     dtype=np.uint8)
    base = np.zeros((ss, ss, 3), dtype=np.uint8)
    for t in range(C.NUM_OBJECT_TYPES):
        for c in range(C.NUM_COLORS):
            for s in range(3):
                code = (t * C.NUM_COLORS + c) * 3 + s
                base[:] = 0
                R.fill(base, R.rect(0, 0.031, 0, 1), (100, 100, 100))
                R.fill(base, R.rect(0, 1, 0, 0.031), (100, 100, 100))
                try:
                    R.paint_object(base, t, c, s)
                except (ValueError, KeyError):
                    pass  # codes with no painter render as bare tiles
                for agent_slot in range(5):
                    img = base.copy()
                    if agent_slot > 0:
                        tri = R.triangle((0.12, 0.19), (0.87, 0.50), (0.12, 0.81))
                        tri = R.rotate(tri, 0.5, 0.5,
                                       0.5 * math.pi * (agent_slot - 1))
                        R.fill(img, tri, (255, 0, 0))
                    atlas[agent_slot, code] = R.downsample(img, subdivs).astype(
                        np.uint8)
                    hl = img.copy()
                    R.highlight(hl)
                    atlas[5 + agent_slot, code] = R.downsample(
                        hl, subdivs).astype(np.uint8)
    return atlas


def get_atlas(tile_size: int = C.TILE_PIXELS):
    """Tile atlas for a tile size (built once, cached).

    Cached as HOST numpy: ``jnp.asarray`` inside a traced function yields a
    tracer-wrapped constant, and caching that poisons every later trace
    with an UnexpectedTracerError (hit when ``get_frame`` was first called
    under ``jax.jit`` by the GIF generator).  A numpy array is a safe
    constant under any transformation and jnp ops consume it directly."""
    if tile_size not in _atlas_cache:
        _atlas_cache[tile_size] = _build_atlas_np(tile_size)
    return _atlas_cache[tile_size]


def cell_codes(grid: jnp.ndarray) -> jnp.ndarray:
    """(W, H) atlas code per cell: (type*11 + color)*3 + state.
    Takes the PACKED uint32 grid (grid_ops.py)."""
    g = grid.astype(jnp.uint32)
    t = (g & 0xFF).astype(jnp.int32)
    c = ((g >> 8) & 0xFF).astype(jnp.int32)
    s = ((g >> 16) & 0xFF).astype(jnp.int32)
    return (t * C.NUM_COLORS + c) * 3 + s


def render_grid(
    grid: jnp.ndarray,
    atlas: jnp.ndarray,
    agent_pos: jnp.ndarray | None = None,
    agent_dir: jnp.ndarray | None = None,
    highlight_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Grid.render (grid.py:200-242) as one gather.  Returns
    uint8[H*T, W*T, 3] (frames are row-major [y, x] like the reference)."""
    w, h = grid.shape[:2]
    tile = atlas.shape[-2]
    codes = cell_codes(grid)  # (W, H)

    variant = jnp.zeros((w, h), dtype=jnp.int32)
    if agent_pos is not None:
        slot = (1 + agent_dir).astype(jnp.int32)
        xs = jnp.arange(w)[:, None]
        ys = jnp.arange(h)[None, :]
        at_agent = (xs == agent_pos[0]) & (ys == agent_pos[1])
        variant = jnp.where(at_agent, slot, variant)
    if highlight_mask is not None:
        variant = variant + 5 * highlight_mask.astype(jnp.int32)

    # the atlas arrives as host numpy (see get_atlas); lift it to a trace
    # constant here so tracer indexing works
    tiles = jnp.asarray(atlas)[variant, codes]  # (W, H, T, T, 3)
    frame = tiles.transpose(1, 2, 0, 3, 4).reshape(h * tile, w * tile, 3)
    return frame


def full_render(
    state: EnvState, params: EnvParams, atlas: jnp.ndarray,
    highlight: bool = True,
) -> jnp.ndarray:
    """get_full_render (minigrid_env.py:669-715): world frame with the
    agent's visible view highlighted.  The reference's per-cell
    back-projection loop is one scatter of the view's world coordinates."""
    if highlight:
        wx, wy = view_world_coords(state.agent_pos, state.agent_dir,
                                   params.agent_view_size)
        _, vis_mask = gen_obs_grid(state, params)
        in_bounds = ((wx >= 0) & (wx < params.width)
                     & (wy >= 0) & (wy < params.height))
        m = vis_mask & in_bounds
        # back-project the view onto world cells with a compare instead of
        # a scatter (V*V x W*H compare is tiny; scatters serialize)
        xs = jnp.arange(params.width)[:, None, None, None]
        ys = jnp.arange(params.height)[None, :, None, None]
        hmask = jnp.any((xs == wx[None, None]) & (ys == wy[None, None])
                        & m[None, None], axis=(2, 3))
    else:
        hmask = None
    return render_grid(state.grid, atlas, state.agent_pos, state.agent_dir,
                       hmask)


def pov_render(state: EnvState, params: EnvParams,
               atlas: jnp.ndarray) -> jnp.ndarray:
    """get_pov_render (minigrid_env.py:653-667): the agent's view rendered
    with invisible cells blanked, agent at center-bottom facing up."""
    v = params.agent_view_size
    cells, vis_mask = gen_obs_grid(state, params)  # packed uint32[V, V]
    unseen = jnp.uint32(1)  # packed (empty, 0, 0) — constant (no scatter)
    cells = jnp.where(vis_mask, cells, unseen)
    return render_grid(
        cells, atlas,
        agent_pos=jnp.asarray([v // 2, v - 1]),
        agent_dir=jnp.asarray(3),
    )


def pov_render_batch(states: EnvState, params: EnvParams,
                     atlas, channels_first: bool = False) -> jnp.ndarray:
    """Batched agent-POV RGB render: uint8[B, V*T, V*T, 3] (or
    uint8[B, 3, V*T, V*T] with ``channels_first=True``).

    The per-env ``pov_render`` under ``vmap`` lowers its atlas
    fancy-indexing to B separate gather programs; here the whole batch is
    ONE flat row gather from the ``[NUM_VARIANTS*NUM_CODES, T*T*3]`` atlas.
    Pixel-identical to ``vmap(pov_render)`` (tests/test_render.py).

    Layout reality (measured, v5e, B=4096, T=8): the reference-shaped
    ``uint8[B, 56, 56, 3]`` OUTPUT pads its minor (56, 3) dims onto
    (64, 128) vector tiles — ~42x its useful bytes, ~1.9 GB of HBM per
    step — so the render is layout-bound at ~1.1M steps/s no matter how
    the gather is formulated.  ``channels_first=True`` returns
    ``[B, 3, 56, 56]`` whose (56, 56) minor dims pad only ~2.6x — the
    TPU-native choice for a conv consumer."""
    from minigrid_tpu.core.obs import gen_obs_grid_batch

    v = params.agent_view_size
    B = states.agent_dir.shape[0]
    tile = atlas.shape[-2]
    cells, vis_mask = gen_obs_grid_batch(states, params)  # packed u32[B,V,V]
    unseen = jnp.uint32(1)  # packed (empty, 0, 0)
    cells = jnp.where(vis_mask, cells, unseen)
    codes = cell_codes(cells)  # [B, V, V]
    # agent triangle at (V//2, V-1) facing 'up' (dir slot 3+1=4); the POV
    # render has no highlight variants (pov_render above)
    variant = jnp.zeros((v, v), jnp.int32).at[v // 2, v - 1].set(4)
    flat = variant[None] * NUM_CODES + codes  # [B, V, V]
    # Gather ROWS of a [rows, T*T*3] table, not (T, T, 3) slices: a slice
    # with minor dims (T, 3) pads onto (8, 128) vector tiles (~42x its
    # bytes at T=8 — measured 3.6 ms/step at B=4096); a single flat minor
    # dim of T*T*3 bytes pads only to the next 128-lane multiple.
    atlas_flat = jnp.asarray(atlas).reshape(
        NUM_VARIANTS * NUM_CODES, tile * tile * 3)
    tiles = jnp.take(atlas_flat, flat.reshape(-1), axis=0)
    # keep the gather in its row layout: fused with the transpose below XLA
    # re-layouts the gather output per-slice (measured 6.6 ms vs 0.93 ms
    # for the bare row gather at B=4096)
    tiles = jax.lax.optimization_barrier(tiles)
    tiles = tiles.reshape(B, v, v, tile, tile, 3)
    # frames are row-major [y, x] like the reference; the first within-tile
    # axis is y (render_grid's transpose(1, 2, 0, 3, 4))
    if channels_first:
        return tiles.transpose(0, 5, 2, 3, 1, 4).reshape(
            B, 3, v * tile, v * tile)
    return tiles.transpose(0, 2, 3, 1, 4, 5).reshape(
        B, v * tile, v * tile, 3)


def get_frame(state: EnvState, params: EnvParams, highlight: bool = True,
              tile_size: int = C.TILE_PIXELS,
              agent_pov: bool = False) -> jnp.ndarray:
    """MiniGridEnv.get_frame (minigrid_env.py:717-740)."""
    atlas = get_atlas(tile_size)
    if agent_pov:
        return pov_render(state, params, atlas)
    return full_render(state, params, atlas, highlight=highlight)
