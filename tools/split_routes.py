"""Split a Bench2Drive routes XML into N contiguous shards.

Counterpart of `bench2drive/tools/split_xml.py:1-35`: the parallel
closed-loop evaluation (`tools/run_closed_loop.sh`) assigns each
CARLA-server/agent worker one shard ``split_<i>.xml``. Contiguous (not
round-robin) splitting keeps each worker's routes in the same towns, which
is what the reference does and what keeps per-worker map-loading time down.

    python tools/split_routes.py --routes bench2drive220.xml \
        --num 8 --out-dir splits/
"""

from __future__ import annotations

import argparse
import os
import xml.etree.ElementTree as ET


def split_contiguous(items, n):
    """n contiguous chunks whose sizes differ by at most 1."""
    k, m = divmod(len(items), n)
    return [items[i * k + min(i, m):(i + 1) * k + min(i + 1, m)]
            for i in range(n)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--routes", required=True, help="source routes .xml")
    p.add_argument("--num", type=int, default=8, help="number of shards")
    p.add_argument("--out-dir", default="splits")
    args = p.parse_args()

    tree = ET.parse(args.routes)
    routes = tree.getroot().findall("route")
    os.makedirs(args.out_dir, exist_ok=True)
    for i, chunk in enumerate(split_contiguous(routes, args.num)):
        root = ET.Element("routes")
        for r in chunk:
            root.append(r)
        path = os.path.join(args.out_dir, f"split_{i}.xml")
        ET.ElementTree(root).write(path, encoding="utf-8",
                                   xml_declaration=True)
        print(f"{path}: {len(chunk)} routes")


if __name__ == "__main__":
    main()
