"""Fetch the standard NeRF benchmark datasets the shipped configs expect.

The reference points users at the official NeRF data release
(reference: README.md "Data" section / script.sh); this mirrors that
contract without Colab: it downloads and unpacks into --out so that
`dataset.basedir` in configs/*.yml resolves (e.g.
data/nerf_synthetic/lego, data/nerf_llff_data/fern).

Usage:
    python scripts/download_datasets.py --out data [--subset synthetic|llff|all]

Requires network access; on an air-gapped host, place the unpacked
directories under --out yourself and everything else works the same.
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
import zipfile
from pathlib import Path

# Official NeRF data release mirrors (bmild/nerf). The Google Drive
# folder requires interactive auth; these direct mirrors do not.
URLS = {
    "synthetic": (
        "https://storage.googleapis.com/nerf_data/nerf_synthetic.zip",
        "nerf_synthetic",
    ),
    "llff": (
        "https://storage.googleapis.com/nerf_data/nerf_llff_data.zip",
        "nerf_llff_data",
    ),
}


def fetch(name: str, out: Path) -> None:
    url, dirname = URLS[name]
    target = out / dirname
    if target.exists():
        print(f"{target} already present; skipping")
        return
    zip_path = out / f"{dirname}.zip"
    print(f"downloading {url} -> {zip_path} (several GB, be patient)")
    try:
        urllib.request.urlretrieve(url, zip_path)  # noqa: S310 - fixed https URLs
    except Exception as exc:
        print(
            f"download failed ({exc}); fetch {url} manually and unpack into {out}",
            file=sys.stderr,
        )
        raise SystemExit(1)
    print(f"unpacking {zip_path}")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out)
    zip_path.unlink()
    print(f"ready: {target}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", type=Path, default=Path("data"))
    ap.add_argument(
        "--subset", choices=[*URLS.keys(), "all"], default="all",
        help="synthetic (blender lego/mic/materials/...), llff (fern/...), or all",
    )
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    names = list(URLS) if args.subset == "all" else [args.subset]
    for name in names:
        fetch(name, args.out)


if __name__ == "__main__":
    main()
