"""Write the hard procedural scene through the REAL Blender file contract
(transforms_{split}.json + PNG frames), so the full on-disk loader chain —
data/loaders/blender.py -> BlenderDataset -> train/eval CLIs — runs the
reference's flagship pipeline shape end-to-end without network access
(companion to scripts/make_llff_scene.py; configs/hard-blender.yml trains
on the output).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/make_blender_scene.py \
           [--root data/hard_blender] [--size 400] [--train-images 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/hard_blender")
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--train-images", type=int, default=20)
    ap.add_argument("--val-images", type=int, default=2)
    ap.add_argument("--test-images", type=int, default=5)
    ap.add_argument("--gt-samples", type=int, default=512)
    args = ap.parse_args()

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from nerfmeshes_tpu.data.synthetic import write_blender_style_dataset

    t0 = time.time()
    write_blender_style_dataset(
        args.root,
        num_images={
            "train": args.train_images,
            "val": args.val_images,
            "test": args.test_images,
        },
        image_size=args.size,
        scene="hard",
        num_samples=args.gt_samples,
    )
    n = args.train_images + args.val_images + args.test_images
    print(
        f"wrote {n} x {args.size}^2 frames + transforms to {args.root} "
        f"in {time.time() - t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
