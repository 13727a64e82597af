"""ELO rating updates for the PBT population.

Equivalent of madrona_learn's eval_elo / update_population hooks
(reference scripts/jax_train.py:363-371, scripts/common.py print_elos).
Episode scores come from MatchResult winners (jax_policy.py:461-470).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expected_score(r_a, r_b):
    return 1.0 / (1.0 + 10.0 ** ((r_b - r_a) / 400.0))


def elo_update(ratings, match_pairs, scores, k=32.0):
    """ratings: [E]; match_pairs: [M, 2] policy indices; scores: [M] score of
    pairs[:, 0] in [0, 1]. Returns updated ratings (scatter-add of deltas)."""
    ra = ratings[match_pairs[:, 0]]
    rb = ratings[match_pairs[:, 1]]
    ea = expected_score(ra, rb)
    delta = k * (scores - ea)
    updates = jnp.zeros_like(ratings)
    updates = updates.at[match_pairs[:, 0]].add(delta)
    updates = updates.at[match_pairs[:, 1]].add(-delta)
    return ratings + updates


def accumulate_match_scores(win_results, team_policies):
    """Convert finished-match outcomes into (pairs, scores).

    win_results: [N] (-1 unfinished, 0/1 winner team, 2 draw);
    team_policies: [N, 2] policy index per team. Unfinished matches get
    weight 0 via a draw with k-delta 0 handled by masking in the caller.
    """
    score_a = jnp.where(
        win_results == 0, 1.0, jnp.where(win_results == 1, 0.0, 0.5)
    )
    valid = win_results >= 0
    return team_policies, score_a, valid


def print_elos(elos):
    """Pretty-print per-policy ELO ratings (reference scripts/common.py
    print_elos)."""
    import numpy as np

    elos = np.asarray(elos).reshape(-1)
    print("ELO:")
    for i, e in enumerate(elos):
        print(f"  policy {i}: {float(e):.1f}")


def elo_update_masked(ratings, pairs, scores, valid, k=32.0):
    ra = ratings[pairs[:, 0]]
    rb = ratings[pairs[:, 1]]
    ea = expected_score(ra, rb)
    delta = jnp.where(valid, k * (scores - ea), 0.0)
    updates = jnp.zeros_like(ratings)
    updates = updates.at[pairs[:, 0]].add(delta)
    updates = updates.at[pairs[:, 1]].add(-delta)
    return ratings + updates
