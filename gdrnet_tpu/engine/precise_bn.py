"""Precise-BN: recompute BatchNorm statistics with a true average over N
training batches before evaluation (reference TEST.PRECISE_BN,
configs/_base_/common_base.py:169 via fvcore/detectron2 update_bn_stats).

flax BN accumulates an EMA during training; here each batch's statistics are
taken from the mutated batch_stats of a train-mode forward and averaged
arithmetically — the fvcore semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def update_bn_stats(model, variables: dict, batches, num_iters: int = 200,
                    model_kwargs_fn=None) -> dict:
    """batches: iterable of batch dicts with 'roi_img' (+ model kwargs).
    Returns variables with replaced batch_stats."""
    if "batch_stats" not in variables or not variables["batch_stats"]:
        return variables

    # momentum=0 EMA == current batch stats; we average over batches manually
    sums = jax.tree.map(jnp.zeros_like, variables["batch_stats"])
    n = 0
    for batch in batches:
        if n >= num_iters:
            break
        kwargs = model_kwargs_fn(batch) if model_kwargs_fn else {}
        _, mutated = model.apply(
            variables, batch["roi_img"], **kwargs, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(n)})
        # EMA with momentum m: new = m*old + (1-m)*batch -> recover batch
        # stats exactly: batch = (new - m*old) / (1-m), m=0.9
        m = 0.9
        batch_stats = jax.tree.map(
            lambda new, old: (new - m * old) / (1.0 - m),
            mutated["batch_stats"], variables["batch_stats"])
        sums = jax.tree.map(lambda s, b: s + b, sums, batch_stats)
        n += 1
    if n == 0:
        return variables
    mean_stats = jax.tree.map(lambda s: s / n, sums)
    out = dict(variables)
    out["batch_stats"] = mean_stats
    return out
