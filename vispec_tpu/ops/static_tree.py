"""Static (hand-designed) draft trees — the reference's choices.py / utils_c.py.

The reference ships `mc_sim_7b_63`, a 25-node hand-built tree of path tuples
(vispec/model/choices.py), consumed by utils.generate_tree_buffers (:90-220)
and the utils_c.Tree precomputation for the Medusa-style static pipeline.  In
this framework a static tree is just a :class:`vispec_tpu.ops.tree.Tree` built
once on host, so the buffer zoo (tree_indices / p_indices / b_indices /
retrieve_indices) collapses into the parent-pointer representation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .tree import Tree

# the published 25-node static tree constant (reference choices.py:1-27,
# originally from the Medusa/EAGLE repos): root-relative paths of child ranks.
MC_SIM_7B_63: Tuple[Tuple[int, ...], ...] = (
    (0,), (1,), (2,), (3,),
    (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0), (2, 1), (3, 0),
    (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 0), (0, 1, 1), (0, 2, 0),
    (0, 2, 1), (1, 0, 0),
    (0, 0, 0, 0), (0, 0, 0, 1), (0, 0, 0, 2),
    (0, 0, 0, 0, 0), (0, 0, 0, 0, 1),
)


def from_choices(choices: Sequence[Tuple[int, ...]], tokens=None) -> Tree:
    """Build a Tree from a choices-style path list.

    Nodes sort by (depth, path) as the reference does
    (utils.py:100 `sorted(tree_choices, key=lambda x: (len(x), x))`); node 0 is
    the root.  ``tokens`` optionally fills the token ids ([len(choices)+1]).
    """
    paths = sorted(choices, key=lambda x: (len(x), x))
    n = len(paths) + 1
    index_of = {(): 0}
    parent = np.zeros(n, np.int32)
    for i, path in enumerate(paths):
        index_of[tuple(path)] = i + 1
        parent[i + 1] = index_of[tuple(path[:-1])]

    mask = np.eye(n, dtype=bool)
    for i in range(1, n):
        mask[i] |= mask[parent[i]]
    depth = mask.sum(1).astype(np.int32) - 1

    if tokens is None:
        tokens = np.zeros(n, np.int32)
    return Tree(
        tokens=jnp.asarray(tokens, jnp.int32),
        parent=jnp.asarray(parent),
        mask=jnp.asarray(mask),
        depth=jnp.asarray(depth),
    )


def fill_tokens(tree: Tree, per_level_topk: jnp.ndarray, choices: Sequence[Tuple[int, ...]], sample_token) -> Tree:
    """Populate a static tree's tokens from per-(parent, rank) top-k ids.

    per_level_topk: [n_nodes, k_max] — token candidates per node (row 0 = root);
    node for path p gets per_level_topk[parent(p), p[-1]].
    """
    paths = sorted(choices, key=lambda x: (len(x), x))
    index_of = {(): 0}
    toks = [jnp.asarray(sample_token, jnp.int32)]
    for i, path in enumerate(paths):
        index_of[tuple(path)] = i + 1
        parent_idx = index_of[tuple(path[:-1])]
        toks.append(per_level_topk[parent_idx, path[-1]].astype(jnp.int32))
    return tree._replace(tokens=jnp.stack(toks))
