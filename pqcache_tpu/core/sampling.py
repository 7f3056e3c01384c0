"""Token sampling: greedy / temperature / top-k / nucleus (top-p).

The reference generates greedily everywhere (vq_pred.py:166-185,
do_sample=False); a serving framework needs stochastic decoding too. This
module builds a pure, jit-friendly sampler from static knobs
(RuntimeConfig.temperature/top_k/top_p) so the decode loop compiles ONE
program per configuration:

  * temperature == 0 → argmax; the key argument is ignored (and the decode
    loops skip threading a PRNG key through the scan carry entirely).
  * temperature > 0 → logits/T, optionally truncated to the top-k logits
    and/or the smallest prefix of the sorted distribution whose
    probability mass reaches top_p (the nucleus always keeps at least the
    argmax), then one jax.random.categorical draw.

Shapes: logits [..., V] — leading batch dims vectorize (the batched decode
loop samples all B slots with one key per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_sampler(temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0):
    """Returns sample(key, logits [..., V]) -> token ids [...] i32, or None
    for pure greedy (temperature 0 and no truncation requested) so callers
    can keep the key-free argmax fast path."""
    if temperature <= 0.0:
        return None

    def sample(key, logits):
        l = logits.astype(jnp.float32) / temperature
        if top_k and top_k > 0:
            kth = jax.lax.top_k(l, top_k)[0][..., -1:]
            l = jnp.where(l >= kth, l, NEG_INF)
        if top_p < 1.0:
            sorted_l = jnp.sort(l, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_l, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep ranks whose PRECEDING mass is < top_p (always rank 0);
            # the cutoff logit is the smallest kept sorted value
            keep = cum - probs < top_p
            cutoff = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1,
                             keepdims=True)
            l = jnp.where(l >= cutoff, l, NEG_INF)
        return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)

    return sample
