"""Environment documentation generator.

The analogue of the reference's sphinx doc generators
(docs/scripts/gen_mds.py:1-124, gen_gifs.py:1-80): walks the registry,
groups ids by env class, and emits one markdown page per environment family
with its description (class docstring), registered presets, action space,
mission surface, and optionally a rendered frame PNG.

Usage:
    python -m minigrid_tpu.tools.gen_docs --out docs/environments [--images]
"""

from __future__ import annotations

import argparse
import collections
import os


def gen_gif(env_id: str, path: str, num_frames: int = 48,
            tile_size: int = 16, seed: int = 0) -> None:
    """Animated GIF of a random-policy rollout for one env id — the
    analogue of the reference's docs/scripts/gen_gifs.py:1-80, rendered by
    the on-device atlas renderer instead of the per-tile rasterizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    import minigrid_tpu

    env = minigrid_tpu.make(env_id)
    params = env.default_params
    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    _, state = env.reset(k, params)
    step = jax.jit(lambda s, a: env.step(s, a, params))
    frame_fn = jax.jit(
        lambda s: env.get_frame(s, params, tile_size=tile_size)
    )
    frames = []
    rng = np.random.default_rng(seed)
    for _ in range(num_frames):
        frames.append(Image.fromarray(np.asarray(frame_fn(state))))
        a = int(rng.integers(0, env.num_actions))
        _, state, _, te, tr, _ = step(state, jnp.int32(a))
        if bool(te) or bool(tr):
            key, k = jax.random.split(key)
            _, state = env.reset(k, params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=100, loop=0)


def build_pages(with_images: bool = False, out_dir: str = "docs/environments",
                seed: int = 0, with_gifs: bool = False) -> dict[str, str]:
    import jax
    import numpy as np

    import minigrid_tpu
    from minigrid_tpu.core.step import Actions
    from minigrid_tpu.registry import spec

    by_cls: dict = collections.defaultdict(list)
    for env_id in minigrid_tpu.registered_ids():
        by_cls[spec(env_id).cls].append(env_id)

    pages: dict[str, str] = {}
    for cls, ids in sorted(by_cls.items(), key=lambda kv: kv[0].__name__):
        name = cls.__name__
        lines = [f"# {name}", ""]
        doc = (cls.__doc__ or "").strip()
        if doc:
            lines += [doc, ""]

        if with_images:
            img_path = os.path.join(out_dir, "img", f"{name}.png")
            if not os.path.exists(img_path):  # media is content-stable per seed
                env = minigrid_tpu.make(ids[0])
                params = env.default_params
                _, state = env.reset(jax.random.PRNGKey(seed), params)
                frame = np.asarray(env.get_frame(state, params))
                os.makedirs(os.path.dirname(img_path), exist_ok=True)
                _write_png(img_path, frame)
            lines += [f"![{name}](img/{name}.png)", ""]
        if with_gifs:
            gif_path = os.path.join(out_dir, "gif", f"{name}.gif")
            if not os.path.exists(gif_path):
                gen_gif(ids[0], gif_path, seed=seed)
            lines += [f"![{name} rollout](gif/{name}.gif)", ""]
        if with_images or with_gifs:
            # every family compiles its own reset/step/render programs and
            # never reuses another's; dropping them keeps a full 72-family
            # media build from exhausting the jit cache (LLVM OOMs)
            jax.clear_caches()

        env = minigrid_tpu.make(ids[0])
        try:
            mission = (env.mission_text(np.asarray(env.mission_codes()[0]))
                       or "(episode-specific)")
        except Exception:
            mission = "(episode-specific)"
        lines += ["## Mission", "", f"`{mission}`", ""]
        lines += ["## Action space", ""]
        lines += [f"| {a.value} | `{a.name}` |" for a in Actions]
        lines.insert(-len(list(Actions)), "|----|--------|")
        lines.insert(-len(list(Actions)) - 1, "| id | action |")
        lines += ["", "## Registered presets", ""]
        lines += ["| id | kwargs |", "|----|--------|"]
        for env_id in sorted(ids):
            kw = spec(env_id).kwargs
            kw_str = ", ".join(f"{k}={v}" for k, v in kw.items()) or "—"
            lines.append(f"| `{env_id}` | {kw_str} |")
        pages[name] = "\n".join(lines) + "\n"
    return pages


def _write_png(path: str, rgb) -> None:
    """Minimal dependency-free PNG writer (uint8 RGB)."""
    import struct
    import zlib

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def main() -> None:
    # Doc generation is a host-side batch job (tiny single-env programs,
    # one compile per family): pin it to the CPU backend — on the tunneled
    # remote TPU every family pays the slow remote compile for no benefit.
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/environments")
    p.add_argument("--images", action="store_true")
    p.add_argument("--gifs", action="store_true",
                   help="render an animated random-rollout GIF per family "
                        "(reference docs/scripts/gen_gifs.py)")
    args = p.parse_args()
    pages = build_pages(with_images=args.images, out_dir=args.out,
                        with_gifs=args.gifs)
    os.makedirs(args.out, exist_ok=True)
    index = ["# Environments", ""]
    for name, content in sorted(pages.items()):
        with open(os.path.join(args.out, f"{name}.md"), "w") as f:
            f.write(content)
        index.append(f"- [{name}]({name}.md)")
    with open(os.path.join(args.out, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(pages)} pages to {args.out}")


if __name__ == "__main__":
    main()
