"""Pallas row-write kernel: scatter whole 128-lane rows by index.

TPU-native replacement for the write half of XLA's scatter on embedding
tables (reference counterpart: fbgemm TBE's fused optimizer writes,
SURVEY.md §2.1 row 3). XLA lowers ``table.at[ids].set(rows)`` to a
read-modify-write loop that costs ~95-120 ns/row on v5e; this kernel
issues one async DMA per row from a VMEM block straight into the HBM
table and sustains ~46 ns/row (measured, 127k rows into a [6.75M, 128]
f32 table) — descriptor-issue bound, independent of row bytes.

Constraints (all enforced by the packed-table layout in
parallel/emb_engine.py):
- the table's minor dim must be a multiple of 128 lanes (Mosaic can
  only slice HBM refs at 128-lane granularity);
- duplicate target ids race (content undefined) — callers route
  duplicate ranks to a scratch row;
- ids at/after ``n_valid`` positions may point at a scratch row too
  (static-shape padding).

On non-TPU backends (CPU tests) ``write_rows`` falls back to XLA's
scatter — bit-identical results, just slower.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8192   # ids per grid step
_RING = 16      # in-flight DMA ring depth (rate plateaus by 16)


def _write_kernel(pid_ref, table_in_ref, rows_ref, table_out_ref, sems,
                  *, chunk, ring):
    del table_in_ref  # aliased to table_out_ref
    base = pl.program_id(0) * chunk

    def mk(i, slot):
        tgt = pid_ref[base + i]
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(i, 1), :],
            table_out_ref.at[pl.ds(tgt, 1), :],
            sems.at[slot],
        )

    def prologue(i, _):
        mk(i, jax.lax.rem(i, ring)).start()
        return 0

    jax.lax.fori_loop(0, ring, prologue, 0)

    def body(i, _):
        slot = jax.lax.rem(i, ring)
        mk(i, slot).wait()

        @pl.when(i + ring < chunk)
        def _():
            mk(i + ring, jax.lax.rem(i + ring, ring)).start()

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _pallas_write_rows(table, ids, rows):
    n = ids.shape[0]
    chunk = min(_CHUNK, n)
    # ring depth can never exceed the rows actually resident in the VMEM
    # block: a deeper prologue would read pid_ref/rows out of bounds and
    # issue DMAs the body never waits on (garbage-index writes)
    ring = min(_RING, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # table (aliased)
            pl.BlockSpec((chunk, table.shape[-1]),
                         lambda s, ids_ref: (s, 0),
                         memory_space=pltpu.VMEM),            # rows
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, chunk=chunk, ring=ring),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={1: 0},  # after the scalar arg: table -> out
    )(ids, table, rows)


def supports_pallas_write(table_lanes: int) -> bool:
    return table_lanes % 128 == 0


def write_rows(
    table: jnp.ndarray,   # [P, L] with L % 128 == 0
    ids: jnp.ndarray,     # [K] int32 row indices (duplicates race)
    rows: jnp.ndarray,    # [K, L] same dtype as table
    scratch_id: int,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """table[ids[k]] = rows[k] for every k; returns the updated table.

    ``scratch_id`` pads K up to the kernel's chunk multiple — padding
    writes land on that (engine-owned, never-read) row.
    """
    if rows.shape[-1] != table.shape[-1]:
        raise ValueError(
            f"row width {rows.shape[-1]} != table lanes {table.shape[-1]}"
        )
    n = ids.shape[0]
    # tiny writes (n < ring depth) gain nothing from the DMA ring and
    # n == 0 would divide by zero below — XLA scatter handles both
    if n < _RING or not (
        use_pallas and supports_pallas_write(table.shape[-1])
    ):
        return table.at[ids].set(rows.astype(table.dtype), mode="drop")
    chunk = min(_CHUNK, n)
    pad = (-n) % chunk
    if pad:
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), scratch_id, ids.dtype)]
        )
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, rows.shape[-1]), rows.dtype)]
        )
    return _pallas_write_rows(table, ids.astype(jnp.int32), rows)
