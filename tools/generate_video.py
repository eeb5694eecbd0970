"""Stitch agent BEV visualization dumps into an animated GIF.

Counterpart of `bench2drive/tools/generate_video.py` (ffmpeg mp4 composition
of the agent's JPEG dumps) without an ffmpeg dependency: consumes the
``bev_*.png`` frames written by ``AgentCore(visualize_dir=...)``.

    python tools/generate_video.py --frames out/agent_0/viz --out run.gif
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", required=True, help="dir with bev_*.png")
    p.add_argument("--out", default="run.gif")
    p.add_argument("--fps", type=float, default=5.0)
    args = p.parse_args()

    from PIL import Image

    paths = sorted(glob.glob(os.path.join(args.frames, "bev_*.png")))
    if not paths:
        print("no frames found")
        return
    frames = [Image.open(p) for p in paths]
    frames[0].save(
        args.out, save_all=True, append_images=frames[1:],
        duration=int(1000 / args.fps), loop=0,
    )
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
