"""Integer encodings and behavior tables for the TPU-native MiniGrid engine.

The reference (``/root/reference/minigrid/core/constants.py:40-111``) defines the
object-type / color / door-state integer codings and direction vectors.  Here the
same codings become *device-resident lookup tables*: per-type behavior predicates
(``can_overlap`` / ``can_pickup`` / ``see_behind`` — reference
``minigrid/core/world_object.py:47-65`` and subclasses) are constant int8/bool
vectors indexed by type id, so the whole object model evaluates as branchless
gathers under ``jit``/``vmap``.
"""

from __future__ import annotations

import numpy as np

TILE_PIXELS = 32

# Color name -> RGB, exactly the reference palette (constants.py:8-19).
COLORS = {
    "red": np.array([255, 0, 0], dtype=np.uint8),
    "green": np.array([0, 255, 0], dtype=np.uint8),
    "blue": np.array([0, 0, 255], dtype=np.uint8),
    "purple": np.array([112, 39, 195], dtype=np.uint8),
    "yellow": np.array([255, 255, 0], dtype=np.uint8),
    "grey": np.array([100, 100, 100], dtype=np.uint8),
    "white": np.array([255, 255, 255], dtype=np.uint8),
    "cyan": np.array([0, 255, 255], dtype=np.uint8),
    "brown": np.array([139, 69, 19], dtype=np.uint8),
    "orange": np.array([255, 99, 71], dtype=np.uint8),
}

COLOR_NAMES = sorted(COLORS.keys())

# Color ids start at 1 (reference constants.py:24-35); 0 is "no color".
COLOR_TO_IDX = {
    "red": 1,
    "green": 2,
    "blue": 3,
    "purple": 4,
    "yellow": 5,
    "grey": 6,
    "white": 7,
    "cyan": 8,
    "brown": 9,
    "orange": 10,
}
IDX_TO_COLOR = {v: k for k, v in COLOR_TO_IDX.items()}
NUM_COLORS = 11  # ids 0..10 (0 unused by named colors)

# Object type ids — the full 34-entry fork table (reference constants.py:40-82).
OBJECT_TO_IDX = {
    "unseen": 0,
    "empty": 1,
    "wall": 2,
    "floor": 3,
    "door": 4,
    "block": 5,
    "north": 6,
    "east": 7,
    "south": 8,
    "west": 9,
    "agent": 10,
    "square": 11,
    "circle": 12,
    "oval": 13,
    "line": 14,
    "rectangle": 15,
    "diamond": 16,
    "ring": 17,
    "cross": 18,
    "star": 19,
    "arrow": 20,
    "key": 21,
    "ball": 22,
    "box": 23,
    "tree": 24,
    "cup": 25,
    "tool": 26,
    "building": 27,
    "crate": 28,
    "chair": 29,
    "flower": 30,
    "goal": 31,
    "lava": 32,
    "gripped_block": 33,
}
IDX_TO_OBJECT = {v: k for k, v in OBJECT_TO_IDX.items()}
NUM_OBJECT_TYPES = 34

OBJECT_NAMES = sorted(OBJECT_TO_IDX.keys())
NON_BASE_OBJ_NAMES = [
    o
    for o in OBJECT_NAMES
    if o not in ["unseen", "empty", "wall", "floor", "door", "goal", "lava", "agent"]
]

# Door states (reference constants.py:95-99).
STATE_TO_IDX = {"open": 0, "closed": 1, "locked": 2}
IDX_TO_STATE = {v: k for k, v in STATE_TO_IDX.items()}

# Direction id -> unit vector, (x, y): 0 east, 1 south, 2 west, 3 north
# (reference constants.py:102-111).
DIR_TO_VEC = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.int32)

# ---------------------------------------------------------------------------
# Behavior tables.  These replace the WorldObj virtual-method dispatch
# (reference world_object.py:47-65 + per-class overrides) with type-indexed
# constant vectors; door state handling is applied on top by the step kernel.
# ---------------------------------------------------------------------------

_T = OBJECT_TO_IDX


def _table(true_names: list[str]) -> np.ndarray:
    t = np.zeros(NUM_OBJECT_TYPES, dtype=bool)
    for n in true_names:
        t[_T[n]] = True
    return t


# "empty" is walkable (reference step: `fwd_cell is None or can_overlap()`,
# minigrid_env.py:549); goal/floor/lava overlap-able (world_object.py:162-189);
# doors handled separately (open only, world_object.py:222-224).
CAN_OVERLAP = _table(["empty", "floor", "goal", "lava"])
CAN_OVERLAP_DOOR_OPEN = True  # door can_overlap == is_open (state == 0)

# Pickup: every shape/thing + block/gripped_block; NOT compass glyphs
# (world_object.py:603-679 North/East/South/West can_pickup False).
CAN_PICKUP = _table(
    [
        "block",
        "gripped_block",
        "square",
        "circle",
        "oval",
        "line",
        "rectangle",
        "diamond",
        "ring",
        "cross",
        "star",
        "arrow",
        "key",
        "ball",
        "box",
        "tree",
        "cup",
        "tool",
        "building",
        "crate",
        "chair",
        "flower",
    ]
)

# see_behind: everything except wall (world_object.py:210-211) and
# closed/locked doors (world_object.py:226-227, applied via state by the
# vis kernel).
SEE_BEHIND = np.ones(NUM_OBJECT_TYPES, dtype=bool)
SEE_BEHIND[_T["wall"]] = False
SEE_BEHIND_DOOR_OPEN_ONLY = True  # door see_behind == is_open

# Canonical cell triples.
EMPTY_TRIPLE = np.array([_T["empty"], 0, 0], dtype=np.uint8)
UNSEEN_TRIPLE = np.array([0, 0, 0], dtype=np.uint8)
WALL_TRIPLE = np.array([_T["wall"], COLOR_TO_IDX["grey"], 0], dtype=np.uint8)
GOAL_TRIPLE = np.array([_T["goal"], COLOR_TO_IDX["green"], 0], dtype=np.uint8)
LAVA_TRIPLE = np.array([_T["lava"], COLOR_TO_IDX["red"], 0], dtype=np.uint8)
FLOOR_TRIPLE = np.array([_T["floor"], COLOR_TO_IDX["blue"], 0], dtype=np.uint8)
