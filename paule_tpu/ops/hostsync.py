"""Host-transfer packing.

On a tunneled TPU every device->host transfer costs a full round trip
(~20 ms) and the transfers of a pytree's leaves do NOT pipeline — fetching a
12-leaf tree costs 12 RTTs.  ``fetch_packed`` ravels and concatenates all
leaves into ONE device buffer with cheap async dispatches, fetches it in a
single transfer, and unpacks on the host.

Measured trade-off (v5e behind the axon tunnel): for arrays whose producing
computation has NOT finished, packing wins big (79 ms vs 399 ms for a
12-leaf, ~2.5 MB tree); for arrays already computed, the client keeps host
copies and plain ``jax.device_get`` is ~free (0.1 ms) while packing pays the
concat + full transfer (~100 ms).  The planning hot path fetches right after
large computations whose results the client auto-streams, so it uses plain
``device_get``; use this helper when fetching many small UNREADY leaves with
no auto-streamed copies.
"""

import numpy as np
import jax
import jax.numpy as jnp


def fetch_packed(tree):
    """Fetch a pytree of same-float-dtype device arrays in one transfer."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    dtypes = {jnp.asarray(l).dtype for l in leaves}
    if len(dtypes) != 1:
        # mixed dtypes: fall back to the plain per-leaf fetch
        return jax.device_get(tree)
    if len(leaves) == 1:
        return jax.tree.unflatten(
            treedef, [np.asarray(jax.device_get(leaves[0]))])
    flat = [jnp.ravel(l) for l in leaves]
    packed = jnp.concatenate(flat)
    host = np.asarray(jax.device_get(packed))
    out, off = [], 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        out.append(host[off:off + n].reshape(leaf.shape))
        off += n
    return jax.tree.unflatten(treedef, out)
