"""Microbenchmark: page-cotangent reduction strategies (encode bwd wall).

The paged-encode backward reduces N row cotangents [N, cw] into P page
rows by page index — jax.ops.segment_sum today (~22 ns/row measured
earlier; scatter-bound). This probes the alternatives at flagship
shapes so the numbers drive the design (see BENCH_NOTES.md).

Run on the real chip:  timeout 590 python scripts/bench_segsum.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    n = 8192 * 64          # rows per level at the flagship step
    cw = 4 * 128           # C=4 channels x 128 lanes
    p = 8192               # pages per hashed level
    lvls = 7               # hashed levels at L8 (coarsest is dense/dedup)
    rng = np.random.default_rng(0)
    rows16 = jnp.asarray(rng.standard_normal((n, cw)), jnp.bfloat16)
    rows32 = rows16.astype(jnp.float32)
    idx = jnp.asarray(rng.integers(0, p, n), jnp.int32)
    idx_l = jnp.asarray(rng.integers(0, p, (lvls, n)), jnp.int32)

    def report(name, dt, nrows=n):
        print(f"{name:42s} {dt*1e3:8.2f} ms  {dt/nrows*1e9:6.1f} ns/row")

    # 1. baseline: per-level segment_sum bf16
    f = jax.jit(lambda r, i: jax.ops.segment_sum(r, i, num_segments=p))
    report("segment_sum bf16", timeit(f, rows16, idx))

    # 2. f32
    f32 = jax.jit(lambda r, i: jax.ops.segment_sum(r, i, num_segments=p))
    report("segment_sum f32", timeit(f32, rows32, idx))

    # 3. half width (row-rate vs bandwidth bound?)
    fh = jax.jit(lambda r, i: jax.ops.segment_sum(r, i, num_segments=p))
    report("segment_sum bf16 cw/2", timeit(fh, rows16[:, :cw // 2], idx))

    # 3b. quarter width
    report("segment_sum bf16 cw/4", timeit(fh, rows16[:, :cw // 4], idx))

    # 4. scatter via .at[].add
    fa = jax.jit(lambda r, i: jnp.zeros((p, cw), r.dtype).at[i].add(r))
    report("at[].add bf16", timeit(fa, rows16, idx))

    # 5. one-hot matmul, chunked (MXU)
    def onehot_chunked(r, i, chunk=8192):
        acc = jnp.zeros((p, cw), jnp.float32)
        nr = r.shape[0]
        for s in range(0, nr, chunk):
            oh = (i[s:s + chunk, None]
                  == jnp.arange(p, dtype=jnp.int32)[None, :])
            acc += jax.lax.dot_general(
                oh.astype(jnp.bfloat16), r[s:s + chunk],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc
    foh = jax.jit(onehot_chunked)
    report("one-hot matmul bf16 (chunk 8192)", timeit(foh, rows16, idx,
                                                      iters=5))

    # 6. sort + unsorted_segment via sorted cumsum-diff
    def sort_reduce(r, i):
        order = jnp.argsort(i)
        rs = r[order].astype(jnp.float32)
        si = i[order]
        cs = jnp.cumsum(rs, axis=0)
        # last row of each segment: positions where next index differs
        is_last = jnp.concatenate([si[1:] != si[:-1],
                                   jnp.ones((1,), bool)])
        seg_end = jnp.where(is_last[:, None], cs, 0.0)
        tot = jax.ops.segment_sum(seg_end, si, num_segments=p)
        # convert suffix totals to per-segment sums via exclusive diff
        csum_tot = jnp.cumsum(tot, axis=0)
        return jnp.concatenate([csum_tot[:1], jnp.diff(csum_tot, axis=0)],
                               axis=0)
    # (rough probe only; correctness not the point here)
    fs = jax.jit(sort_reduce)
    report("argsort+cumsum f32", timeit(fs, rows16, idx, iters=5))

    # 7. fused: all levels in ONE segment_sum
    rows_all = jnp.asarray(
        rng.standard_normal((lvls * n, cw)), jnp.bfloat16)
    offs = (jnp.arange(lvls, dtype=jnp.int32) * p)[:, None]
    idx_all = (idx_l + offs).reshape(-1)
    ff = jax.jit(
        lambda r, i: jax.ops.segment_sum(r, i, num_segments=lvls * p))
    report(f"fused segment_sum bf16 x{lvls} levels",
           timeit(ff, rows_all, idx_all, iters=5), nrows=lvls * n)

    # 8. per-level loop for comparison at same total
    def per_level(r, i):
        outs = []
        for l in range(lvls):
            outs.append(jax.ops.segment_sum(
                r[l * n:(l + 1) * n], i[l], num_segments=p))
        return jnp.stack(outs)
    fpl = jax.jit(per_level)
    report(f"per-level segment_sum bf16 x{lvls}",
           timeit(fpl, rows_all, idx_l, iters=5), nrows=lvls * n)

    # 9. sorted-input segment_sum (is the wall the disorder or the op?)
    idx_sorted = jnp.sort(idx)
    report("segment_sum bf16 (pre-sorted idx)", timeit(f, rows16,
                                                       idx_sorted))


if __name__ == "__main__":
    main()
