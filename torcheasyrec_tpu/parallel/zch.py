"""Zero-collision hash (managed-collision) embedding id remapping.

TPU-native replacement for TorchRec's ManagedCollisionModule / the
dynamicemb GPU hash table (reference tzrec/features/feature.py:693-736
builds mc_modules with LFU/LRU/DistanceLFU eviction;
modules/embedding.py mc_ebc path; SURVEY.md §7 hard part #3).

Design: a device-resident open-addressing table as plain arrays
(keys/score/last-access), fully vectorized — each id probes K=8
double-hashed slots; resolution order is match > empty > evict the
min-score probe slot. Eviction is immediate-on-insert rather than the
reference's interval-sweep (same policy family, simpler and functional;
interval sweeps would need non-batched host callbacks). Within-batch
slot races resolve last-writer-wins; losing ids read a neighbor's row
for one step and re-insert on their next occurrence.

Eviction scores (reference feature.proto ZeroCollisionHash):
  LFU:          score = access count
  LRU:          score = 1 / (step - last_access) ** decay
  DistanceLFU:  score = count / (step - last_access) ** decay

Interval eviction (eviction_interval, reference default 5): occupied
slots may only be evicted on steps where ``step % interval == 0``;
between sweeps new ids still claim EMPTY slots, and unmatched ids
read probe slot 0 without writing (the functional analogue of the
reference's periodic _update sweep, mc_modules in feature.py:693-736).

Frequency admission (DynamicEmbFrequencyAdmissionStrategy,
feature.proto): ids are counted in a separate hashed counter array of
``counter_size`` slots; until an id's count reaches ``admit_threshold``
it is NOT admitted — it maps to -1, so the engine gathers zeros and
drops its updates (the reference's non-admitted default-initializer
with CONSTANT 0).

threshold_filtering_func (experimental, same contract as the
reference): a python lambda string over the batch's per-id occurrence
counts returning a keep-mask (or (mask, threshold)); filtered ids are
treated read-only for this batch.
"""

import dataclasses
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp

N_PROBES = 8
EMPTY = jnp.int64(-1) if jax.config.jax_enable_x64 else -1


@dataclasses.dataclass
class ZchConfig:
    size: int
    policy: str = "lfu"  # lfu | lru | distance_lfu
    decay_exponent: float = 1.0
    eviction_interval: int = 1  # evict only when step % interval == 0
    admit_threshold: int = 0  # frequency admission (0 = admit all)
    counter_size: int = 0  # admission counter slots (0 -> 4 * size)
    filter_fn: Any = None  # threshold_filtering_func lambda string


def init_state(size: int, counter_size: int = 0) -> Dict[str, jnp.ndarray]:
    st = {
        "keys": jnp.full((size,), -1, jnp.int32),
        "count": jnp.zeros((size,), jnp.float32),
        "last": jnp.zeros((size,), jnp.int32),
    }
    if counter_size > 0:
        st["admit_cnt"] = jnp.zeros((counter_size,), jnp.float32)
    return st


def _batch_counts(flat: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-element occurrence count of its id within the batch (static
    shapes: sort + run-length via segment_sum, inverse permutation)."""
    n = flat.shape[0]
    ids = jnp.where(valid, flat, jnp.int32(-2))
    order = jnp.argsort(ids)
    sids = ids[order]
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(head) - 1
    per_run = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg, num_segments=n)
    sorted_counts = per_run[seg]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return sorted_counts[inv]


def _apply_filter_fn(fn: Any, counts: jnp.ndarray) -> jnp.ndarray:
    """Evaluate threshold_filtering_func -> boolean keep mask."""
    if isinstance(fn, str):
        fn = eval(fn, {"jnp": jnp, "jax": jax, "np": jnp})  # noqa: S307
    out = fn(counts)
    if isinstance(out, tuple):
        mask, thr = out[0], out[1]
        if mask is None:
            return counts > thr
        return mask.astype(bool) & (counts > thr)
    return out.astype(bool)


def _hash1(ids, size):
    x = ids.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45D9F3B)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45D9F3B)
    x = x ^ (x >> 16)
    return (x % jnp.uint32(size)).astype(jnp.int32)


def _hash2(ids, size):
    x = ids.astype(jnp.uint32)
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    return (x % jnp.uint32(max(size - 1, 1))).astype(jnp.int32) + 1


def _scores(state, cfg: ZchConfig, step):
    age = jnp.maximum(
        (step - state["last"]).astype(jnp.float32), 1.0
    )
    if cfg.policy == "lru":
        return age ** (-cfg.decay_exponent)
    if cfg.policy == "distance_lfu":
        return state["count"] / (age ** cfg.decay_exponent)
    return state["count"]  # lfu


def lookup_insert(
    state: Dict[str, jnp.ndarray],
    cfg: ZchConfig,
    ids: jnp.ndarray,  # int [N] raw ids (>= 0 valid; negatives = padding)
    step: jnp.ndarray,
    training: bool,
    collect_spill: bool = False,
) -> Union[
    Tuple[jnp.ndarray, Dict[str, jnp.ndarray]],
    Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]],
]:
    """Returns (slots [N] int32, new_state).

    With ``collect_spill=True`` returns (slots, new_state, spill) where
    spill carries the host-spill tier's per-element eviction/admission
    record (reference dynamicemb/HKV: unbounded key space with host
    memory behind the device cache, feature.proto:90-117):

      evicted_keys[i]: the raw key whose row element i displaced from
        its slot this step (-1 if none) — the host stores that row.
      fresh_keys[i]:   the raw key newly inserted at slots[i] (-1 if
        the element matched an existing entry) — if the host store
        holds a previously-spilled row for it, the row is restored
        into the device table before the NEXT step (one-step-late
        readmission; the insert step itself trains from the slot's
        prior contents).
    """
    shape = ids.shape
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    size = state["keys"].shape[0]
    valid = flat >= 0

    # frequency admission: bump hashed counters, gate on threshold
    new_admit = state.get("admit_cnt")
    if cfg.admit_threshold > 0 and new_admit is not None:
        cslots = _hash1(flat, new_admit.shape[0])
        if training:
            new_admit = new_admit.at[
                jnp.where(valid, cslots, new_admit.shape[0])
            ].add(1.0, mode="drop")
        admitted = new_admit[cslots] >= cfg.admit_threshold
        valid = valid & admitted

    # experimental threshold_filtering_func: drop low-count batch ids
    # from update/eviction (they still read probe 0 when matched)
    writable = valid
    if cfg.filter_fn and training:
        writable = valid & _apply_filter_fn(
            cfg.filter_fn, _batch_counts(flat, valid)
        )

    h1 = _hash1(flat, size)
    h2 = _hash2(flat, size)
    probes = (
        h1[:, None]
        + jnp.arange(N_PROBES, dtype=jnp.int32)[None, :] * h2[:, None]
    ) % size  # [N, K]

    keys_at = state["keys"][probes]  # [N, K]
    # padding ids (-1) must never match the empty-slot sentinel (-1)
    is_match = (keys_at == flat[:, None]) & valid[:, None]
    is_empty = keys_at == -1

    def _first_true(mask):
        # index of first True along K, or K if none
        return jnp.argmax(
            jnp.concatenate(
                [mask, jnp.ones((n, 1), bool)], axis=1
            ),
            axis=1,
        )

    match_k = _first_true(is_match)
    empty_k = _first_true(is_empty)
    scores = _scores(state, cfg, step)[probes]  # [N, K]
    evict_k = jnp.argmin(scores, axis=1)

    has_match = match_k < N_PROBES
    has_empty = empty_k < N_PROBES
    chosen_k = jnp.where(
        has_match, jnp.minimum(match_k, N_PROBES - 1),
        jnp.where(has_empty, jnp.minimum(empty_k, N_PROBES - 1), evict_k),
    )
    slots = jnp.take_along_axis(probes, chosen_k[:, None], axis=1)[:, 0]

    if not training:
        # read-only: unmatched ids deterministically use probe 0;
        # padding stays -1 (engine gathers zeros, drops updates)
        slots_ro = jnp.where(has_match, slots, probes[:, 0])
        slots_ro = jnp.where(valid, slots_ro, -1)
        if new_admit is not None:
            state = dict(state, admit_cnt=new_admit)
        if collect_spill:
            none = jnp.full((n,), -1, jnp.int32)
            return slots_ro.reshape(shape), state, {
                "evicted_keys": none, "fresh_keys": none,
                "slots": slots_ro,
            }
        return slots_ro.reshape(shape), state

    # interval eviction: between sweeps an unmatched id without an
    # empty probe slot must NOT displace an occupied slot — it maps to
    # -1 (zeros, update dropped) and retries on the next sweep. The
    # same applies to filter_fn-gated unmatched ids: returning a live
    # probe slot would scatter this id's gradient into another key's
    # row.
    needs_evict = ~has_match & ~has_empty
    blocked = ~has_match & ~writable
    if cfg.eviction_interval > 1:
        evict_ok = (
            jnp.asarray(step, jnp.int32) % cfg.eviction_interval
        ) == 0
        blocked = blocked | (needs_evict & ~evict_ok)
    writable = writable & ~blocked
    valid = valid & ~blocked

    write = writable
    w_slots = jnp.where(write, slots, size)  # OOB drop for padding
    new_keys = state["keys"].at[w_slots].set(flat, mode="drop")
    # reset count on eviction/new insert; increment on access
    fresh = write & ~has_match
    cnt = state["count"]
    cnt = cnt.at[jnp.where(fresh, w_slots, size)].set(0.0, mode="drop")
    cnt = cnt.at[w_slots].add(jnp.where(write, 1.0, 0.0), mode="drop")
    last = state["last"].at[w_slots].set(
        jnp.asarray(step, jnp.int32), mode="drop"
    )
    new_state = {"keys": new_keys, "count": cnt, "last": last}
    if new_admit is not None:
        new_state["admit_cnt"] = new_admit
    slots = jnp.where(valid, slots, -1)
    if collect_spill:
        old_key = jnp.take_along_axis(
            keys_at, chosen_k[:, None], axis=1
        )[:, 0]
        # a fresh insert that displaced a live key spills that key's
        # row; a fresh insert (evicting OR claiming an empty slot) is a
        # readmission candidate. Within-batch duplicate fresh inserts
        # of the same id are harmless (same slot, same stored row);
        # DIFFERENT new ids racing for one slot resolve last-writer-
        # wins in the scatter, so a restore may seed the winner's row
        # from the loser's spill — one random-init-equivalent row, self-
        # corrected by training (documented, matches the scatter race
        # already inherent to lookup_insert).
        spill = {
            "evicted_keys": jnp.where(
                fresh & (old_key >= 0), old_key, -1
            ).astype(jnp.int32),
            "fresh_keys": jnp.where(fresh, flat, -1).astype(jnp.int32),
            "slots": slots.astype(jnp.int32),
        }
        return slots.reshape(shape), new_state, spill
    return slots.reshape(shape), new_state
