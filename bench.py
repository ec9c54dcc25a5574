"""Throughput benchmark: DeepFM on a Criteo-shaped synthetic workload.

Matches the reference's headline training config
(/root/reference/examples/deepfm_criteo.config: batch 8192, 26 id
features with the real Criteo-Terabyte bucket sizes — five 40M-row
tables — dim 16, 13 dense features, Adagrad sparse + Adam dense).
Measures steady-state jitted train-step throughput on the local
device(s) and prints ONE JSON line.

vs_baseline: ratio against a DERIVED A100 baseline of 350k examples/s
for this config (BASELINE.md's north star is >=2x A100 per chip; the
reference publishes no throughput numbers). Derivation in BASELINE.md
"A100 stand-in derivation": single-A100-80GB HBM roofline for this
exact config's embedding traffic (~6.7 kB/example random rows ->
~304k examples/s ceiling at 100% sector efficiency) cross-checked
against the public per-GPU MLPerf DLRM envelope (~240-490k); 350k is
deliberately generous to the A100.

Methodology: the headline value is the best END-TO-END pipeline rate
(host parse/pack in workers or a thread, H2D, jitted train step); the
``compute_path`` fields are the device ceiling over resident batches.

SYNC HONESTY: on this container's tunnel platform,
``jax.block_until_ready`` returns WITHOUT waiting for execution
(measured: 1 ms reported for 3.3 s of chained matmuls), so every timed
window here ends with ``jax.device_get`` of a loss scalar whose value
transitively depends on the whole donated-state chain — that forces
real completion. Rounds 1-2 of this repo used block_until_ready and
overstated device throughput ~400x. The honest round-5 step is
~8.6 ms at batch 8192 (round 4: ~15.3, round 3: ~88): the dense lane
(emb_engine._dense_lane_update) moved the <=32k-row tables — half the
id stream — off the sort/scatter path onto one-hot MXU matmuls + one
block write; the remainder stays DMA-descriptor-bound on the
packed-row gather (~17-20 ns/row) + Pallas DMA row-write (~46-55
ns/row) over ~106k big-table rows/step, not MXU-bound (dense FLOPs
are ~0.1 ms).
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_EXAMPLES_PER_SEC = 350_000.0

# Criteo-Terabyte bucket sizes from the reference config, with the 40M
# tables capped at 10M so weights + rowwise-adagrad state fit a single
# v5e chip's 16G HBM (the reference trains this sharded over 8 GPUs;
# multi-chip runs restore the full 40M rows via row-wise sharding).
# TZREC_BENCH_CAP overrides (dev iteration: smaller caps cut the
# init-time H2D, which matters on this container's degrading tunnel;
# per-step row counts are batch-bound, so kernel timings transfer).
_CAP = int(os.environ.get("TZREC_BENCH_CAP", str(10_000_000)))
CRITEO_RAW = [
    40000000, 39060, 17295, 7424, 20265, 3, 7122, 1543, 63, 40000000,
    3067956, 405282, 10, 2209, 11938, 155, 4, 976, 14, 40000000, 40000000,
    40000000, 590152, 12973, 108, 36,
]
CRITEO_BUCKETS = [min(n, _CAP) for n in CRITEO_RAW]
BATCH_SIZE = 8192
EMB_DIM = 16
WARMUP = 5
STEPS = 30


def build_config(buckets=None, bf16_rows=0):
    """Criteo DeepFM config. buckets: per-feature table rows (default
    the capped CRITEO_BUCKETS). bf16_rows: tables with at least this
    many rows store BF16 (the full-size single-chip variant — five
    40M-row tables in fp32 + optimizer state exceed 16 GB HBM, while
    bf16 weights + fp32 rowwise-adagrad state fit)."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2

    buckets = CRITEO_BUCKETS if buckets is None else buckets
    lines = [
        'train_input_path: "unused"',
        'eval_input_path: "unused"',
        'model_dir: "/tmp/bench_model"',
        "train_config {",
        "  sparse_optimizer { rowwise_adagrad_optimizer { lr: 0.001 }"
        " constant_learning_rate {} }",
        "  dense_optimizer { adam_optimizer { lr: 0.001 }"
        " constant_learning_rate {} }",
        "  num_epochs: 1",
        '  mixed_precision: "BF16"',
        "}",
        "data_config {",
        f"  batch_size: {BATCH_SIZE}",
        "  dataset_type: ParquetDataset",
        "  fg_mode: FG_NONE",
        '  label_fields: "label"',
        "}",
    ]
    for i in range(13):
        lines.append(
            f'feature_configs {{ raw_feature {{ feature_name: "int_{i}" }} }}'
        )
    for i, n in enumerate(buckets):
        dt = (
            " data_type: 'BF16'" if bf16_rows and n >= bf16_rows else ""
        )
        lines.append(
            f'feature_configs {{ id_feature {{ feature_name: "cat_{i}" '
            f"num_buckets: {n} embedding_dim: {EMB_DIM}{dt} }} }}"
        )
    cat_names = "".join(
        f'    feature_names: "cat_{i}"\n' for i in range(len(buckets))
    )
    int_names = "".join(f'    feature_names: "int_{i}"\n' for i in range(13))
    lines.append(
        "model_config {\n"
        "  feature_groups {\n"
        '    group_name: "wide"\n' + cat_names +
        "    group_type: WIDE\n  }\n"
        "  feature_groups {\n"
        '    group_name: "fm"\n' + cat_names +
        "    group_type: DEEP\n  }\n"
        "  feature_groups {\n"
        '    group_name: "deep"\n' + cat_names + int_names +
        "    group_type: DEEP\n  }\n"
        "  deepfm {\n"
        "    deep { hidden_units: [512, 256, 128] }\n"
        "    final { hidden_units: [128, 64] }\n"
        "    wide_embedding_dim: 4\n"
        "  }\n"
        "  num_class: 1\n"
        "  losses { binary_cross_entropy {} }\n"
        "  metrics { auc {} }\n"
        "}"
    )
    return text_format.Parse(
        "\n".join(lines), pipeline_pb2.EasyRecConfig()
    )


def _full_size_stage():
    """Full-size Criteo on ONE chip (VERDICT r4 #8): the five 40M-row
    tables UNCAPPED, stored BF16 (weights) + fp32 rowwise-adagrad
    state — the reference's real table sizes (examples/
    deepfm_criteo.config) end-to-end instead of the 10M-capped
    headline config. Reports the device compute path only (the host
    pipeline is table-size-independent). BF16 groups use the unpacked
    [rows, dim] layout, initialized ON DEVICE (no multi-GB H2D)."""
    import jax
    import jax.numpy as jnp
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.datasets.pack import pack_and_put
    from torcheasyrec_tpu.main import (
        _build_model_and_optim,
        _init_state,
        make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    cfg = build_config(buckets=CRITEO_RAW, bf16_rows=1_000_000)
    model, features, sparse_sched = _build_model_and_optim(cfg, None)
    parser = DataParser(features, labels=["label"])
    rng = np.random.default_rng(0)
    cols = {"label": pa.array(
        (rng.random(BATCH_SIZE) > 0.5).astype(np.float32))}
    for i in range(13):
        cols[f"int_{i}"] = pa.array(
            rng.normal(size=BATCH_SIZE).astype(np.float32)
        )
    for i, n in enumerate(CRITEO_RAW):
        cols[f"cat_{i}"] = pa.array(rng.integers(0, n, BATCH_SIZE))
    batch = pack_and_put(parser.parse_to_batch(cols), dense_bf16=True)
    dense, tables, sparse_opt = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense
    )
    state = {
        "dense": dense, "tables": tables, "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense), "step": jnp.zeros((), jnp.int32),
    }
    train_step = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched,
                        jnp.bfloat16),
        donate_argnums=(0,),
    )
    rng_k = jax.random.key(0)
    for _ in range(3):
        state, m, _ = train_step(state, batch, rng_k)
    float(jax.device_get(m["total_loss"]))
    best = float("inf")
    n_steps = 20
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m, _ = train_step(state, batch, rng_k)
        float(jax.device_get(m["total_loss"]))
        best = min(best, time.perf_counter() - t0)
    return {
        "full_size_compute_examples_per_sec": round(
            BATCH_SIZE * n_steps / best, 1
        ),
        "full_size_step_ms": round(best / n_steps * 1000, 3),
        "full_size_total_rows": int(sum(CRITEO_RAW)),
    }


def _synth_cols(seed: int):
    """One Criteo-shaped Arrow column set (pa.Array.from_pandas takes
    pyarrow's zero-copy numpy path; pa.array() would cost ~0.8 ms/col
    through the generic converter)."""
    import pyarrow as pa

    r = np.random.default_rng(seed)
    c = {"label": pa.Array.from_pandas(
        (r.random(BATCH_SIZE) > 0.5).astype(np.float32))}
    for i in range(13):
        c[f"int_{i}"] = pa.Array.from_pandas(
            r.normal(size=BATCH_SIZE).astype(np.float32)
        )
    for i, n in enumerate(CRITEO_BUCKETS):
        c[f"cat_{i}"] = pa.Array.from_pandas(r.integers(0, n, BATCH_SIZE))
    return c


class _BenchDatasetFactory:
    """Picklable mp-loader factory. Column sets are pregenerated ONCE
    per worker (synthesis is a stand-in for upstream storage, not
    framework work) so the measured mp pipeline covers exactly what the
    thread pipeline covers: Arrow feature parse + batch pack in the
    workers, shm hand-off, H2D, jitted step."""

    def __init__(self, features, n_batches: int, n_sets: int = 6) -> None:
        self.features = features
        self.n_batches = n_batches
        self.n_sets = n_sets

    def __call__(self, w: int):
        from torcheasyrec_tpu.datasets.data_parser import DataParser
        from torcheasyrec_tpu.datasets.utils import BatchInfo

        parser = DataParser(self.features, labels=["label"])
        sets = [
            _synth_cols(w * 100_003 + i) for i in range(self.n_sets)
        ]
        for i in range(self.n_batches):
            yield parser.parse_to_batch(sets[i % self.n_sets]), BatchInfo(
                batch_size=BATCH_SIZE
            )


def main() -> None:
    import jax
    import jax.numpy as jnp
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.main import (
        _init_state,
        _shard_batch,
        make_train_step,
    )
    from torcheasyrec_tpu.main import _build_model_and_optim
    from torcheasyrec_tpu.optim.optimizer_builder import create_dense_optimizer
    from torcheasyrec_tpu.parallel.mesh import maybe_mesh

    cfg = build_config()
    mesh = maybe_mesh()
    model, features, sparse_sched = _build_model_and_optim(cfg, mesh)

    parser = DataParser(features, labels=["label"])
    rng = np.random.default_rng(0)
    cols = {"label": pa.array((rng.random(BATCH_SIZE) > 0.5).astype(
        np.float32))}
    for i in range(13):
        cols[f"int_{i}"] = pa.array(
            rng.normal(size=BATCH_SIZE).astype(np.float32)
        )
    for i, n in enumerate(CRITEO_BUCKETS):
        cols[f"cat_{i}"] = pa.array(rng.integers(0, n, BATCH_SIZE))
    from torcheasyrec_tpu.datasets.pack import pack_and_put

    batch = parser.parse_to_batch(cols)
    if mesh is None:
        # coalesced narrow-buffer transfer (production single-chip path)
        batch = pack_and_put(batch, dense_bf16=True)
    else:
        batch = _shard_batch(batch, mesh)

    dense_params, tables, sparse_opt_state = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense_params
    )
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt_state,
        "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    train_step = jax.jit(
        make_train_step(
            model, tx, sparse_sched, dense_sched, jnp.bfloat16
        ),
        donate_argnums=(0,),
    )
    step_rng = jax.random.key(0)

    for _ in range(WARMUP):
        state, metrics, _ = train_step(state, batch, step_rng)
    float(jax.device_get(metrics["total_loss"]))

    # best-of-3: the tunnel shares the chip, so single measurements
    # are noisy; best reflects the actual device capability
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics, _ = train_step(state, batch, step_rng)
        float(jax.device_get(metrics["total_loss"]))
        dt = min(dt, time.perf_counter() - t0)

    # end-to-end pipeline rate: host parse + H2D + step, overlapped
    def _gen_cols(seed):
        r = np.random.default_rng(seed)
        c = {"label": pa.array((r.random(BATCH_SIZE) > 0.5).astype(
            np.float32))}
        for i in range(13):
            c[f"int_{i}"] = pa.array(
                r.normal(size=BATCH_SIZE).astype(np.float32)
            )
        for i, n in enumerate(CRITEO_BUCKETS):
            c[f"cat_{i}"] = pa.array(r.integers(0, n, BATCH_SIZE))
        return c

    import queue as _queue
    import threading as _threading

    from torcheasyrec_tpu.datasets.pack import pack_batch, put_packed

    n_pipe = 24
    all_cols = [_gen_cols(i) for i in range(n_pipe)]  # pregenerated (a
    # real reader's decode cost is measured by the parse step below)

    # stage-split pipeline: ONE parse+pack thread (more threads contend
    # on the GIL and run slower), ONE H2D-put thread, step dispatch on
    # the main thread. Steady state = the serialized GIL-bound host
    # work; the put thread still buys ~15% by hiding queue latency.
    def _pipe_round():
        nonlocal state  # thread the live state: inputs are donated
        q: "_queue.Queue" = _queue.Queue(maxsize=8)
        q2: "_queue.Queue" = _queue.Queue(maxsize=8)

        def _producer():
            for i in range(n_pipe):
                b = parser.parse_to_batch(all_cols[i])
                q.put(pack_batch(b, dense_bf16=True) if mesh is None else b)

        def _putter():
            for _ in range(n_pipe):
                p = q.get()
                q2.put(
                    put_packed(p) if mesh is None else _shard_batch(p, mesh)
                )

        ths = [
            _threading.Thread(target=_producer, daemon=True),
            _threading.Thread(target=_putter, daemon=True),
        ]
        t0 = time.perf_counter()
        for th in ths:
            th.start()
        for _ in range(n_pipe):
            state, m, _ = train_step(state, q2.get(), step_rng)
        float(jax.device_get(m["total_loss"]))
        return time.perf_counter() - t0

    pipe_dt = min(_pipe_round() for _ in range(2))
    pipeline_eps = BATCH_SIZE * n_pipe / pipe_dt

    # multi-process pipeline: K worker processes own column synthesis +
    # parse + pack (the GIL-bound host path); the consumer only does
    # device_put + step dispatch. This is the production loader
    # (data_config.num_workers, datasets/mp_loader.py).
    mp_pipeline_eps = None
    if mesh is None:
        try:
            from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader

            # NOTE: grouped multi-step dispatch (make_train_step_scan +
            # group_size) was measured here too; through THIS
            # container's tunnel it loses to per-batch stepping because
            # large single transfers get no more bandwidth than two
            # ~0.7 MB transfers in flight, while the coarser pipeline
            # granularity adds bubbles. On real TPU hosts (fast PCIe,
            # dispatch-latency-bound) the grouped path is the faster
            # one; both are supported.
            n_workers = 3
            # effectively-infinite stream: the timed region consumes a
            # fixed count mid-stream and the loader is closed early
            loader = MpBatchLoader(
                _BenchDatasetFactory(features, 100_000),
                n_workers,
                dense_bf16=True,
                device_put_fn=put_packed,
                prefetch=6,
            )
            try:
                # warm by SLEEPING, not consuming: spawn-mode workers
                # stagger their startup by seconds (each re-imports
                # jax/pyarrow), but consuming batches to wait them out
                # would run thousands of H2D puts first — and this
                # container's experimental tunnel leaks host memory
                # per transferred byte and degrades put latency ~20x
                # after ~4-5 GB of lifetime transfers (measured; a
                # platform bug absent on real TPU hosts). Sleeping
                # costs <10 puts (the loader's bounded prefetch), so
                # the timed region stays inside the clean window.
                time.sleep(8.0)
                for _ in range(10 * n_workers):
                    b, _info = next(loader)
                    state, m, _ = train_step(state, b, step_rng)
                # best of 3 windows (the tunnel shares the chip; the
                # compute path above is best-of-3 for the same reason)
                best_dt = float("inf")
                for _ in range(3):
                    n_timed = 500
                    t0 = time.perf_counter()
                    for _ in range(n_timed):
                        b, _info = next(loader)
                        state, m, _ = train_step(state, b, step_rng)
                    float(jax.device_get(m["total_loss"]))
                    best_dt = min(best_dt, time.perf_counter() - t0)
                mp_pipeline_eps = BATCH_SIZE * n_timed / best_dt
            finally:
                loader.close()
        except Exception as e:  # noqa: BLE001 - bench must not die here
            print(f"mp pipeline stage skipped: {e!r}", file=sys.stderr)

    # grouped multi-step dispatch (steps_per_dispatch analogue): K
    # batches stacked into ONE (K, W) wire, one H2D put, one scanned
    # K-step jitted call. The per-batch path pays ~2 host dispatches
    # per batch; when the host link is latency-bound (and on this
    # container the tunnel's put latency DEGRADES with lifetime
    # transferred bytes — a platform bug documented above), this is
    # the resilient production path (docs/pipeline.md).
    mp_grouped_eps = None
    if mesh is None:
        try:
            from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader
            from torcheasyrec_tpu.datasets.pack import put_packed_group
            from torcheasyrec_tpu.main import make_train_step_scan

            K = 8
            scan_step = jax.jit(
                make_train_step_scan(
                    model, tx, sparse_sched, dense_sched, jnp.bfloat16
                ),
                donate_argnums=(0,),
            )
            loader = MpBatchLoader(
                _BenchDatasetFactory(features, 100_000),
                3,
                dense_bf16=True,
                device_put_fn=put_packed_group,
                prefetch=6,
                group_size=K,
            )
            try:
                time.sleep(8.0)
                for _ in range(6):
                    g, infos = next(loader)
                    state, m, _ = scan_step(state, g, step_rng)
                float(jax.device_get(m["total_loss"]))
                best_dt = float("inf")
                n_timed = 40  # groups (320 batches)
                for _ in range(2):
                    done = 0
                    t0 = time.perf_counter()
                    for _ in range(n_timed):
                        g, infos = next(loader)
                        state, m, _ = scan_step(state, g, step_rng)
                        done += sum(i.batch_size for i in infos)
                    float(jax.device_get(m["total_loss"]))
                    dt_w = time.perf_counter() - t0
                    best_dt = min(best_dt, dt_w / done)
                mp_grouped_eps = 1.0 / best_dt
            finally:
                loader.close()
        except Exception as e:  # noqa: BLE001
            print(f"mp grouped stage skipped: {e!r}", file=sys.stderr)

    # offline-inference lane (reference predict pipeline): forward-only
    # jitted eval step over resident batches — the per-chip serving
    # ceiling for the same model/batch
    from torcheasyrec_tpu.main import make_eval_step

    eval_step = jax.jit(make_eval_step(model, jnp.bfloat16,
                                       with_loss=False))
    preds, _ = eval_step(state, batch)
    first = jax.tree_util.tree_leaves(preds)[0]
    float(jax.device_get(first.ravel()[0]))
    pdt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            preds, _ = eval_step(state, batch)
        float(jax.device_get(
            jax.tree_util.tree_leaves(preds)[0].ravel()[0]
        ))
        pdt = min(pdt, time.perf_counter() - t0)

    # host-link diagnostic: one-batch H2D put + readback roundtrip.
    # On this container the put path DEGRADES with lifetime transferred
    # bytes (platform bug, see methodology) — recording the link state
    # at measurement time lets a reader separate framework throughput
    # from link health when comparing artifacts across rounds.
    h2d_ms = float("inf")
    try:
        wire = pack_batch(parser.parse_to_batch(all_cols[0]),
                          dense_bf16=True)
        for _ in range(5):
            t0 = time.perf_counter()
            dev_b = put_packed(wire)
            leaf = jax.tree_util.tree_leaves(dev_b)[0]
            jax.device_get(leaf.ravel()[0])
            h2d_ms = min(h2d_ms, (time.perf_counter() - t0) * 1000)
    except Exception as e:  # noqa: BLE001
        print(f"h2d diagnostic skipped: {e!r}", file=sys.stderr)
        h2d_ms = None

    n_dev = len(jax.devices())
    compute_eps = BATCH_SIZE * STEPS / dt / n_dev
    variants = {
        "thread_pipeline": pipeline_eps,
        "mp_pipeline": mp_pipeline_eps or 0.0,
        "mp_grouped_dispatch": mp_grouped_eps or 0.0,
    }
    winner = max(variants, key=variants.get)
    best_pipeline = variants[winner]
    per_chip = best_pipeline / n_dev
    result = {
        "metric": "deepfm_criteo_train_examples_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_EXAMPLES_PER_SEC, 3),
        "compute_path_examples_per_sec": round(compute_eps, 1),
        "compute_step_ms": round(dt / STEPS * 1000, 3),
        "predict_examples_per_sec_per_chip": round(
            BATCH_SIZE * STEPS / pdt / n_dev, 1
        ),
        "thread_pipeline_examples_per_sec": round(pipeline_eps, 1),
        "mp_pipeline_examples_per_sec": (
            round(mp_pipeline_eps, 1) if mp_pipeline_eps else None
        ),
        "mp_grouped_dispatch_examples_per_sec": (
            round(mp_grouped_eps, 1) if mp_grouped_eps else None
        ),
        "n_devices": n_dev,
        "batch_size": BATCH_SIZE,
        "h2d_put_roundtrip_ms": (
            round(h2d_ms, 2) if h2d_ms is not None else None
        ),
        "headline_note": (
            f"value = {winner} ({best_pipeline:,.0f} e/s), the best of "
            f"{{{', '.join(f'{k}: {v:,.0f}' for k, v in variants.items())}}}"
            "; per-batch pipelines win on a healthy host link, the "
            "grouped K-step dispatch wins when the link is "
            "latency-bound (this container's tunnel H2D degrades with "
            "lifetime bytes — docs/pipeline.md)"
        ),
        "methodology": "value = best end-to-end pipeline (pregenerated "
                       "Arrow columns; feature parse + batch pack in "
                       "loader workers or a prefetch thread, tunnel H2D, "
                       "jitted train step, overlapped); compute_path = "
                       "device-resident batches, the per-chip ceiling. "
                       "All windows sync via device_get of a "
                       "chain-dependent loss (block_until_ready does "
                       "not wait on this platform; rounds 1-2 numbers "
                       "were dispatch-rate artifacts). Headline config "
                       f"caps the five 40M-row tables at {_CAP:,} rows "
                       "so fp32 packed weights+state fit one 16G chip; "
                       "the full_size_* metrics run the UNCAPPED "
                       "204M-row tables with bf16 weights",
        "platform": jax.devices()[0].platform,
    }

    # full-size stage (the reference's real ~208M-row table sizes;
    # compute path only). Free the capped DeepFM state first.
    if mesh is None and os.environ.get("TZREC_BENCH_FULL", "1") != "0":
        state = batch = None
        import gc

        gc.collect()
        try:
            result.update(_full_size_stage())
        except Exception as e:  # noqa: BLE001 - lane is best-effort
            print(f"full-size stage skipped: {e!r}", file=sys.stderr)

    # generative flagship lane (kuairand-shaped DLRM-HSTU; see
    # torcheasyrec_tpu/benchmark/bench_dlrm_hstu.py for methodology).
    # Free the DeepFM state first: its ~10 GB of tables + optimizer
    # state would OOM the 16 GB chip under the HSTU model.
    if mesh is None:
        state = batch = None
        import gc

        gc.collect()
        try:
            from torcheasyrec_tpu.benchmark.bench_dlrm_hstu import run

            hstu = run()
            if hstu:
                result.update(hstu)
        except Exception as e:  # noqa: BLE001 - lane is best-effort
            print(f"dlrm_hstu lane skipped: {e!r}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
