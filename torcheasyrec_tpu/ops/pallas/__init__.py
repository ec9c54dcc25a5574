"""Pallas TPU kernels — the Mosaic-compiled hot path.

- ``hstu_attention``: blockwise pointwise-SiLU HSTU attention
  (folded-head no-transpose layout, fused custom-VJP backward, full
  mask family incl. Semi-Local Attention) — replaces the reference's
  Triton/CUTLASS kernels (SURVEY.md §2.1).
- ``row_write``: whole-row DMA scatter used by the packed embedding
  update (parallel/emb_engine.py) — ~2x XLA's scatter per row.

Every kernel has an XLA reference implementation (ops/hstu.py,
jnp scatter fallback) used by the CPU test suite; the real-chip lane
(tests_tpu/) runs the compiled Mosaic versions against those
references.
"""
