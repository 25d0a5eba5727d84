"""Hash-exchange operators for high-cardinality aggregation.

Ray Data's built-in ``groupby().aggregate()`` finalizes groups in a
per-group Python loop, so its cost scales with the number of DISTINCT
KEYS (~5k groups/s measured), regardless of shuffle strategy — a 95k-key
aggregate over 100k rows takes ~20-90s while the equivalent pandas hash
aggregate takes milliseconds. For high-cardinality keys the right shape
is: vectorized pandas partial aggregate per block (no shuffle) → hash
exchange on the key (``repartition(keys=...)``, one all-to-all of the
pre-shrunk stream) → vectorized pandas combine per partition. Measured
at sf0.1: 2-3s vs 18-92s for the built-in (see BASELINE.md).

``repartition(keys=...)`` requires ``ShuffleStrategy.HASH_SHUFFLE``; the
strategy is captured per-dataset at creation, so ``hash_shuffle()`` flips
the global context only while the chain is BUILT and restores it before
anything else is constructed — sort-based shuffles elsewhere (the
north-rule ``sort``, ``map_groups``) keep their faster sort path.
``max_hash_shuffle_aggregators`` is bounded because unbounded aggregator
actor pools (one per partition at default parallelism) flood a node with
workers and get OOM-killed (observed: 176 workers, SIGKILL).

At cluster scale, raise ``num_partitions`` so each combine partition
holds 10-100MB of pre-aggregated rows; the exchange volume is the
pre-shrunk stream, never the raw scan.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from ray.data import DataContext
from ray.data.context import ShuffleStrategy

# The DataContext flip is process-global; dataset CONSTRUCTION windows
# from concurrent pipeline threads must not interleave (execution is
# safe — each dataset captures its context at root creation).
_FLIP_LOCK = threading.RLock()


@contextmanager
def hash_shuffle(num_aggregators: int = 8):
    """Build datasets needing ``repartition(keys=...)`` inside this scope.

    Thread-safe: a process-wide lock serializes the construction windows
    so one thread's flip can't leak into another thread's dataset roots.
    """
    with _FLIP_LOCK:
        with _hash_shuffle_unlocked(num_aggregators) as ctx:
            yield ctx


@contextmanager
def _hash_shuffle_unlocked(num_aggregators: int = 8):
    ctx = DataContext.get_current()
    old_strategy = ctx.shuffle_strategy
    old_max = ctx.max_hash_shuffle_aggregators
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = num_aggregators
    try:
        yield ctx
    finally:
        ctx.shuffle_strategy = old_strategy
        ctx.max_hash_shuffle_aggregators = old_max


def grouped_aggregate(ds, keys, partial_fn, combine_fn, num_partitions: int = 8):
    """Exact high-cardinality groupby-aggregate.

    ``partial_fn``/``combine_fn`` are whole-batch pandas functions:
    ``partial_fn`` aggregates raw rows to one row per key per block;
    ``combine_fn`` merges partials (all rows for a key land in one
    partition after the keyed exchange). The input ``ds`` and this call
    must be created inside ``hash_shuffle()``.
    """
    return (
        ds.map_batches(partial_fn, batch_format="pandas")
        .repartition(num_partitions, keys=keys)
        .map_batches(combine_fn, batch_format="pandas")
    )
