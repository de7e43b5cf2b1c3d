"""Shared scan utilities: compile-bounded chunked associative scans."""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['chunked_prefix_scan']


def chunked_prefix_scan(combine, elems, identity, chunk, reverse=False):
    """Two-level prefix (suffix when ``reverse``) scan over pytree elements.

    Equivalent to ``lax.associative_scan(combine, elems, reverse=reverse)``
    but runs the associative scan inside fixed-size chunks and carries the
    running prefix across chunks with a cheap ``lax.scan``. XLA compile
    time is then bounded by the (power-of-two) chunk size instead of
    growing with T — a single T=100k associative Kalman program takes >15
    minutes to compile through the remote-compile path, while the chunked
    form compiles like a T=8k program and runs within a few percent.

    ``identity`` is a per-element pytree that must be a two-sided identity
    of ``combine`` (used for the cross-chunk carry and tail padding).
    ``combine`` must accept batched (leading-dim) elements, as required by
    ``lax.associative_scan`` itself. Argument order follows
    ``associative_scan``'s convention in the given direction: the first
    argument is the accumulated block on the scan-origin side.
    """
    tmap = jax.tree_util.tree_map
    T = jax.tree_util.tree_leaves(elems)[0].shape[0]
    chunk = int(chunk)
    if T <= chunk:
        return lax.associative_scan(combine, elems, reverse=reverse)
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    if pad:
        elems = tmap(
            lambda e, i: jnp.concatenate(
                [e, jnp.broadcast_to(i, (pad,) + i.shape)], axis=0),
            elems, identity)
    elems = tmap(lambda e: e.reshape((n_chunks, chunk) + e.shape[1:]), elems)

    def body(carry, ch):
        within = lax.associative_scan(combine, ch, reverse=reverse)
        carry_b = tmap(lambda c: jnp.broadcast_to(c, (chunk,) + c.shape), carry)
        full = combine(carry_b, within)
        new_carry = tmap(lambda f: f[0] if reverse else f[-1], full)
        return new_carry, full

    _, out = lax.scan(body, identity, elems, reverse=reverse)
    return tmap(lambda o: o.reshape((n_chunks * chunk,) + o.shape[2:])[:T], out)
