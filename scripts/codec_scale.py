"""Isolate the image codec from Spark: N worker processes, each
gen+encode+verify+phash over the same per-worker image count. If THIS
doesn't scale 8->32, the residual is the machine (shared memory bus),
not the engine."""
import os
import sys
import time
from multiprocessing import Pool

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
sys.path.insert(0, "/root/repo")


def work(args):
    seed0, n = args
    from housing_crawler_spark import synth
    from housing_crawler_spark.operators.images import LOSSLESS, decode, encode, phash64, psnr

    acc = 0
    for i in range(n):
        img = synth.gen_image(seed0 + i, 0, 128, 512, 2.0)
        buf = encode(img, "dctq")
        out, f2 = decode(buf)
        assert psnr(img, out) >= 40.0
        acc ^= phash64(img)
    return acc


def run(nproc: int, per: int) -> float:
    with Pool(nproc) as p:
        t0 = time.perf_counter()
        p.map(work, [(w * 1_000_000, per) for w in range(nproc)])
        el = time.perf_counter() - t0
    return nproc * per / el


if __name__ == "__main__":
    per = int(os.environ.get("PER", "400"))
    r1 = run(1, per)
    r8 = run(8, per)
    r32 = run(32, per)
    print(f"imgs/s 1p={r1:.1f} 8p={r8:.1f} 32p={r32:.1f}  "
          f"eff 1->8={(r8 / r1) / 8:.3f}  8->32={(r32 / r8) / 4:.3f}")
