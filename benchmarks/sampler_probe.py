"""Host sampler cost probe: serial native ladies_sample ms/batch at
canonical scale (the number the round-3/4 host-floor analysis pins).

The canonical epoch is HOST-bound (benchmarks/RESULTS.md "Where the
canonical epoch stands"): 4 sampler workers on a 4-core host set the
epoch floor at ~(steps x serial_batch_ms / cores). This probe measures
the serial batch cost (and its scaling with OMP threads) so host-side
sampler changes are judged by their own number instead of epoch noise.

Run on a QUIET host (no pytest, no TPU job's host side):
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sampler_probe.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(n_batches: int = 12):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from benchmarks.canonical_graph import canonical_graph_and_prob
    from gnn_tpu.ops.hotdense import HotSpec
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu import native

    g, lap, prob = canonical_graph_and_prob(3)
    spec = HotSpec.from_sample_prob(prob, 32768)
    cfg = SamplerConfig(
        batch_size=512, samp_num=8192, orders=(1, 1, 1),
        num_nodes=lap.shape[0], num_classes=41, hot_spec=spec,
        adj_format="resident", resident_val_free=True,
        resident_stream_tiles=True)
    rng = np.random.default_rng(0)
    order = rng.permutation(g.train_nodes)

    for nthreads in (0, 2, 1):  # 0 = library default
        if nthreads:
            lib = native.get_lib()
            lib.set_threads(nthreads)
        # warmup (page faults, buckets, lazy caches)
        ladies_sample(cfg, 0, order[:512], lap, g.labels)
        t0 = time.perf_counter()
        for i in range(n_batches):
            nodes = order[512 * i: 512 * (i + 1)]
            ladies_sample(cfg, i + 1, nodes, lap, g.labels)
        dt = (time.perf_counter() - t0) / n_batches
        label = nthreads if nthreads else "default"
        print(f"omp_threads={label}: {dt * 1e3:.1f} ms/batch serial "
              f"({n_batches} batches)", flush=True)


if __name__ == "__main__":
    main()
