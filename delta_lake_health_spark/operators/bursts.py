"""Kleinberg burst detection (SURVEY §2.3 E38).

Reference: Kleinberg 2002, "Bursty and Hierarchical Structure in
Streams" — the 2-state automaton variant: a user's event stream is in a
base state (rate λ0 = n/T, the stream's own average) or a burst state
(rate s·λ0); emitting a gap x in state q costs −ln(λ_q e^{−λ_q x}) and
entering the burst state costs γ·ln n. The optimal state sequence is a
2-state Viterbi DP over the gap sequence.

Spark shape: the DP is inherently sequential PER USER but embarrassingly
parallel ACROSS users — exactly the applyInPandas contract. Each task
holds one user's gap vector (bounded by that user's event count, never
corpus-sized); the shuffle is one user_id key exchange; output is three
small integers per user. At 100 TB of events this is the same shape as
sessionization: per-key linear work, no cross-key state.

``kleinberg_two_state`` is the pure-Python/numpy reference the Spark
pass calls per group — shared so the parity test is definitionally
aligned.
"""

from __future__ import annotations

import math

DEFAULT_S = 2.0       # burst-state rate multiplier
DEFAULT_GAMMA = 1.0   # transition-cost scale (gamma * ln n per 0->1)


def kleinberg_two_state(
    times: list[float], s: float = DEFAULT_S, gamma: float = DEFAULT_GAMMA
) -> dict:
    """Optimal 2-state labeling of one stream's gaps →
    {n_bursts, burst_gaps, longest_burst}. ``times`` in seconds,
    ascending. Streams with fewer than 3 events have no detectable
    structure and return zeros."""
    n = len(times)
    if n < 3:
        return {"n_bursts": 0, "burst_gaps": 0, "longest_burst": 0}
    gaps = [times[i + 1] - times[i] for i in range(n - 1)]
    span = times[-1] - times[0]
    if span <= 0:
        return {"n_bursts": 0, "burst_gaps": 0, "longest_burst": 0}
    lam0 = (n - 1) / span
    lam1 = s * lam0
    trans = gamma * math.log(n)

    def emit(lam: float, x: float) -> float:
        # -ln(lam * e^{-lam x}); clamp zero gaps to a microsecond so
        # identical timestamps don't produce -inf
        return -(math.log(lam) - lam * max(x, 1e-6))

    # Viterbi over states {0 base, 1 burst}; ties prefer base (stable)
    c0, c1 = 0.0, float("inf")
    back: list[tuple[int, int]] = []
    for x in gaps:
        e0, e1 = emit(lam0, x), emit(lam1, x)
        n0_from = 0 if c0 <= c1 else 1
        n0 = min(c0, c1) + e0
        n1_from = 0 if c0 + trans < c1 else 1
        n1 = min(c0 + trans, c1) + e1
        back.append((n0_from, n1_from))
        c0, c1 = n0, n1
    state = 0 if c0 <= c1 else 1
    labels = [0] * len(gaps)
    for i in range(len(gaps) - 1, -1, -1):
        labels[i] = state
        state = back[i][state]
    n_bursts = sum(
        1
        for i, v in enumerate(labels)
        if v == 1 and (i == 0 or labels[i - 1] == 0)
    )
    longest = run = 0
    for v in labels:
        run = run + 1 if v == 1 else 0
        longest = max(longest, run)
    return {
        "n_bursts": n_bursts,
        "burst_gaps": sum(labels),
        "longest_burst": longest,
    }
