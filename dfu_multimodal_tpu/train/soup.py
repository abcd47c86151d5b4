"""Model soups: weight-space averaging of same-architecture checkpoints
(`dfu soup`).

No reference counterpart — the reference trains one model per family and
keeps the single best-by-val-F1 checkpoint.  Averaging the weights of
several fine-tunes (different seeds / hyperparameters) routinely beats
every ingredient at ZERO inference cost (Wortsman et al. 2022, "Model
soups") — unlike an ensemble, the soup is still one model, so every
serving path (predict/serve/export, int8, TTA) consumes it unchanged.

Two recipes:
- **uniform**: average every candidate;
- **greedy**: sort candidates by their own val F1, then add one at a
  time keeping the addition only when the averaged model's val F1 does
  not drop — the published recipe that makes soups safe when some
  ingredients are bad.

BatchNorm running statistics are averaged along with the weights (the
standard soup treatment; exact for the means, a mild approximation for
the variances).  All selection happens on the validation split — test
stays untouched until the final report.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import numpy as np


def average_model_states(states: Sequence[Dict]) -> Dict:
    """Uniform weight-space average of model_state pytrees (the
    ``payload['model_state']`` trees of utils/checkpoint.py).  All trees
    must share one structure (same architecture) — jax.tree.map enforces
    it with a readable structure error."""
    if not states:
        raise ValueError("nothing to average")
    if len(states) == 1:
        return states[0]

    def mean(*leaves):
        first = np.asarray(leaves[0])
        if not np.issubdtype(first.dtype, np.floating):
            raise ValueError(
                f"cannot soup non-float leaf of dtype {first.dtype} "
                "(int8-quantized checkpoints are not soup ingredients; "
                "quantize AFTER averaging)")
        acc = np.zeros_like(first, dtype=np.float64)
        for leaf in leaves:
            acc += np.asarray(leaf, dtype=np.float64)
        return (acc / len(leaves)).astype(first.dtype)

    return jax.tree.map(mean, *states)


def greedy_soup(candidates: List[Tuple[str, Dict]],
                eval_fn: Callable[[Dict], float],
                log: Callable[[str], None] = print
                ) -> Tuple[Dict, List[str], float]:
    """Greedy soup (Wortsman et al. 2022, alg. 1).

    ``candidates``: (name, model_state) pairs.  ``eval_fn`` scores a
    model_state on the VALIDATION split (higher better).  Candidates are
    ranked by their individual score; each is then added to the pot only
    if the averaged model's score does not drop.  Returns
    (soup_state, ingredient_names, soup_score)."""
    scored = [(name, state, eval_fn(state)) for name, state in candidates]
    scored.sort(key=lambda t: t[2], reverse=True)
    for name, _, s in scored:
        log(f"  candidate {name}: val score {s:.4f}")

    pot = [scored[0][1]]
    names = [scored[0][0]]
    best = scored[0][2]
    for name, state, _ in scored[1:]:
        trial = average_model_states(pot + [state])
        score = eval_fn(trial)
        if score >= best:
            pot.append(state)
            names.append(name)
            best = score
            log(f"  + {name} kept (val {score:.4f})")
        else:
            log(f"  - {name} rejected (val {score:.4f} < {best:.4f})")
    return average_model_states(pot), names, best
