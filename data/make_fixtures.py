"""Regenerate the in-repo data fixtures from a reference checkout.

The repo ships small, re-encoded fixtures so tests/examples/bench run
standalone (without the read-only reference mount). Each file is written
through probreg_tpu's own writers — downsampled where the upstream file is
large — never byte-copied. Provenance: the classic probreg fixtures
(reference examples/bunny.pcd, examples/fish_*.txt, examples/face-*.txt,
data/horse.ply; the bunny/horse originate from the Stanford scanning
repository, the fish/face pairs from the CPD reference datasets).

Usage:  PROBREG_REF_ROOT=/path/to/probreg python data/make_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probreg_tpu.utils import io as pio

REF = os.environ.get("PROBREG_REF_ROOT", "/root/reference")
OUT = os.path.dirname(os.path.abspath(__file__))


def main():
    # bunny.pcd: already tiny (397 pts); re-encode as PCD v0.7 ascii.
    bunny = pio.read_pcd(os.path.join(REF, "examples/bunny.pcd"))
    pio.write_pcd(os.path.join(OUT, "bunny.pcd"), bunny)
    print("bunny.pcd:", bunny.shape)

    # horse.ply: 48k verts upstream; the tests use it voxel-downsampled at
    # 0.01 — ship a 0.004 version (finer than any consumer) as binary-LE
    # float32 PLY.
    horse = pio.read_ply(os.path.join(REF, "data/horse.ply"))
    horse_d = pio.voxel_down_sample(horse, 0.004)
    pio.write_ply(os.path.join(OUT, "horse.ply"), horse_d)
    print("horse.ply:", horse_d.shape)

    # fish 2-D pairs: small; re-encode at shorter precision.
    for which in ("source", "target"):
        fish = np.loadtxt(os.path.join(REF, f"examples/fish_{which}.txt"))
        # %.17g: exact float64 round-trip (the TPS-SVR quality tests are
        # chaotically sensitive to even 1-ulp input changes).
        np.savetxt(os.path.join(OUT, f"fish_{which}.txt"), fish, fmt="%.17g")
        print(f"fish_{which}.txt:", fish.shape)

    # face 3-D nonrigid pair: 25k rows upstream; every consumer
    # (examples/bcpd_nonrigid3d.py) voxel-downsamples at 5.0 — ship a 2.0
    # version (finer than any consumer).
    for which in ("x", "y"):
        face = np.loadtxt(os.path.join(REF, f"examples/face-{which}.txt"))
        face_d = pio.voxel_down_sample(face, 2.0)
        np.savetxt(os.path.join(OUT, f"face-{which}.txt"), face_d, fmt="%.8g")
        print(f"face-{which}.txt:", face_d.shape)


if __name__ == "__main__":
    main()
