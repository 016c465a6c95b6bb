"""[EXT] Generic iterative-dataflow fixpoint operator (round 12,
VERDICT r11 item 8's named stretch).

Every iterative loop this engine runs — PageRank's damped propagation,
connected components' min-label exchange, k-core's monotone peel, BFS
frontier expansion, Markov power iteration, Bellman-Ford relaxation —
shares one skeleton: a state DataFrame, a step that joins state
against a static relation and re-aggregates, ``localCheckpoint``
lineage truncation so N rounds cost O(1) plan depth, and either a
fixed round budget (exactly oracle-unrollable as chained CTEs — the
repo's graph-gate convention) or a convergence probe (the recursive-
CTE-with-termination class). This module factors that skeleton out:
:func:`iterate` is the loop, the caller supplies only the step.

This is deliberately the Spark-native analog of SQL's ``WITH
RECURSIVE``: the unrolled-CTE oracles the graph family already uses
are literally the same dataflow written declaratively, which is what
makes every operator built on this loop hash-checkable.

Scale shape: the loop adds NOTHING to the step's shuffle plan — no
extra exchange, no driver-side data movement. ``localCheckpoint``
(non-eager on the cadence, one eager cut at the end when requested)
bounds both lineage depth and scheduler recursion at 1000-round
scale; the optional convergence probe is one bounded action per round
(`exceptAll(prev).limit(1)` — at most one row crosses to the driver),
the same sanctioned-action class as ``pagerank_until``'s residual
probe. At 100 TB the state frame is node-keyed and orders of
magnitude smaller than the fact tables; the static relation should
arrive pre-partitioned on the join key so every round reuses one
partitioning.

Reference analog: none — the reference (a 1,069-LoC sequential
scraper) has no iteration beyond its URL loop (src/run.py:90-137);
iterative dataflow is [EXT] surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

StepFn = Callable[[DataFrame, int], DataFrame]
ProbeFn = Callable[[DataFrame, DataFrame], bool]


def unchanged(prev: DataFrame, new: DataFrame) -> bool:
    """Default convergence probe: the round changed nothing — the new
    state is row-set-equal to the previous one. Bag-difference both
    ways is overkill for the monotone states the engine iterates
    (same keys every round), so one direction suffices; ``limit(1)``
    keeps the action bounded regardless of state size."""
    return new.exceptAll(prev).limit(1).count() == 0


def iterate(
    state: DataFrame,
    step: StepFn,
    n_rounds: int,
    *,
    checkpoint_every: int = 1,
    eager_final: bool = False,
    stop_when: ProbeFn | None = None,
) -> tuple[DataFrame, int, bool]:
    """Run ``step`` up to ``n_rounds`` times over ``state``; returns
    ``(final_state, rounds_run, converged)``.

    Fixed-budget mode (``stop_when=None``) runs exactly ``n_rounds``
    steps — the oracle-unrollable form every hash-gated iterative
    query uses; ``converged`` is False there (the budget, not a
    probe, ended the loop). Fixpoint mode passes
    ``stop_when(prev, new)``; the loop stops after the first round
    where it returns True (the returned state IS that round's output,
    so a converged run equals the fixed-budget run of any larger
    budget — the property that lets an early-exiting Spark loop match
    a fully-unrolled SQL oracle), and ``converged`` reports whether
    the probe ever fired — callers with a MUST-converge contract
    (connected components would return split clusters otherwise)
    raise on False. Lineage is truncated every ``checkpoint_every``
    rounds (non-eager); ``eager_final`` adds one eager cut after the
    loop for callers that hand the state to further per-round
    consumers.
    """
    if n_rounds < 0:
        raise ValueError(f"n_rounds must be >= 0, got {n_rounds}")
    rounds_run = 0
    converged = False
    for i in range(n_rounds):
        new = step(state, i)
        # checkpoint BEFORE probing, and EAGERLY when a probe exists:
        # the probe is an action over (prev, new), and probing lazy
        # lineage re-executes every prior round per probe — measured
        # 24 s → ~6 s on graph_sssp at sf0.1 when the round-12 EXT6
        # pin first caught it
        if (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=stop_when is not None)
        rounds_run = i + 1
        if stop_when is not None and stop_when(state, new):
            state = new
            converged = True
            break
        state = new
    if eager_final:
        state = state.localCheckpoint(eager=True)
    return state, rounds_run, converged
