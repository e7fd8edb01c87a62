"""Static-shape draft-tree algebra — the TPU replacement for the reference's
host-Python tree bookkeeping.

The reference builds its verify tree with Python loops over tensors-on-host:
ancestor closure at cnets_ours.py:1183-1186, leaf-path table (retrieve_indices)
at cnets_ours.py:1200-1226, greedy longest-prefix acceptance over leaf rows at
utils.py:438-451, and a per-token rejection-sampling loop at utils.py:453-493.

Here the tree is a *parent-pointer array* of static size T = total_tokens:

- node 0 is the sampled root token; nodes are ordered by ascending flat-candidate
  index, which guarantees parent[i] < i;
- the ancestor-closure mask, node depths, acceptance walk, and accepted-path
  extraction are all O(depth) vectorized gathers — no leaf enumeration, no
  dynamic leaf count, no host round-trips.  Greedy acceptance over the tree is
  provably equivalent to longest-prefix matching over all root-to-leaf paths
  (children of a node carry distinct tokens, so the accepted chain is unique).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class Tree(NamedTuple):
    """A drafted verify tree of static size T (= SpecConfig.total_tokens).

    tokens:   [T] int32 — node token ids; tokens[0] is the sampled root.
    parent:   [T] int32 — parent node index; parent[0] = 0 (root is its own parent).
    mask:     [T, T] bool — ancestor closure incl. self (reference "tree_mask").
    depth:    [T] int32 — node depth, root = 0 (reference "tree_position_ids").
    """

    tokens: jax.Array
    parent: jax.Array
    mask: jax.Array
    depth: jax.Array

    @property
    def size(self) -> int:
        return self.tokens.shape[0]


def build_tree(
    sample_token: jax.Array,  # [] int32 — the committed root token
    tokens_flat: jax.Array,  # [C] int32 — candidate tokens, reference flat order
    scores_flat: jax.Array,  # [C] float — cumulative log-probs, same order
    parent1_flat: jax.Array,  # [C] int32 — 1-based flat index of parent (0 = root)
    total_tokens: int,
    max_depth: int,  # deepest possible node depth (= cfg.depth + 1)
) -> Tree:
    """Global top-(T-1) re-ranking + parent-pointer tree construction.

    Mirrors cnets_ours.py:1167-1191: select the best T-1 candidates from the flat
    beam pool, sort selected indices ascending (so tree order follows flat order
    and parents precede children), remap flat parents into tree indices via
    searchsorted, then compute the ancestor closure by iterated parent gathers
    instead of the reference's sequential row-OR loop.
    """
    num_draft = total_tokens - 1
    _, sel = lax.top_k(scores_flat, num_draft)
    sel = jnp.sort(sel)  # ascending => parents precede children

    tokens = jnp.concatenate(
        [sample_token[None].astype(jnp.int32), tokens_flat[sel].astype(jnp.int32)]
    )

    par1 = parent1_flat[sel]  # 1-based flat parent, 0 => root
    # tree index of parent: position of (par1 - 1) within sel, +1 for the root slot
    ppos = jnp.searchsorted(sel, par1 - 1) + 1
    parent_tail = jnp.where(par1 == 0, 0, ppos).astype(jnp.int32)
    parent = jnp.concatenate([jnp.zeros((1,), jnp.int32), parent_tail])

    # Ancestor closure: mask[i, j] = j is an ancestor of i (or i itself).
    eye = jnp.eye(total_tokens, dtype=bool)

    def closure_step(_, carry):
        mask, cursor = carry
        cursor = parent[cursor]  # walk one level up
        mask = mask | eye[cursor]
        return mask, cursor

    cursor0 = jnp.arange(total_tokens, dtype=jnp.int32)
    # static + tiny trip counts: unroll (device loop constructs cost ~0.3ms each)
    carry = (eye, cursor0)
    for _ in range(max_depth):
        carry = closure_step(0, carry)
    mask, _ = carry

    depth = jnp.sum(mask, axis=1).astype(jnp.int32) - 1
    return Tree(tokens=tokens, parent=parent, mask=mask, depth=depth)


def path_to_root(tree: Tree, node: jax.Array, max_path: int) -> jax.Array:
    """[max_path] int32 — node indices root..node ordered by depth; slots past
    depth(node) padded with the node itself (harmless for KV commit, masked
    elsewhere).  Replaces retrieve_indices[best, :acc+1] (utils.py:516-517).

    Closed form: the node's ancestor-closure row selects the chain; each
    ancestor lands in the column of its depth (one masked matvec, no walk)."""
    anc = tree.mask[node]  # [T] — the chain root..node
    idx = jnp.arange(tree.size, dtype=jnp.int32)
    cols = jnp.arange(max_path, dtype=jnp.int32)
    onehot = anc[None, :] & (tree.depth[None, :] == cols[:, None])  # [P, T]
    path = jnp.sum(jnp.where(onehot, idx[None, :], 0), axis=1).astype(jnp.int32)
    return jnp.where(cols <= tree.depth[node], path, node).astype(jnp.int32)


def greedy_accept(
    tree: Tree,
    argmax_tokens: jax.Array,  # [T] int32 — argmax of target logits per tree node
    max_depth: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy (T=0) acceptance walk.

    accepted[i] = accepted[parent[i]] and tokens[i] == argmax[parent[i]];
    the accepted set is a unique root chain.  Returns (best_node, accept_length)
    where accept_length counts accepted non-root nodes — identical semantics to
    the reference's cumprod-over-leaf-rows (utils.py:438-451).

    ``max_depth`` bounds the propagate iterations (deepest possible node depth,
    e.g. SpecConfig.depth + 1); None falls back to the safe T-iteration bound.
    """
    del max_depth  # closed form below needs no iteration
    idx = jnp.arange(tree.size, dtype=jnp.int32)
    match = (tree.tokens == argmax_tokens[tree.parent]) | (idx == 0)
    # node i is accepted iff every node on its root path matched — one [T, T]
    # reduction over the ancestor-closure mask instead of a sequential
    # parent-gather walk (each tiny on-device step cost ~50us)
    accepted = ~jnp.any(tree.mask & ~match[None, :], axis=1)
    depth_if = jnp.where(accepted, tree.depth, -1)
    best = jnp.argmax(depth_if).astype(jnp.int32)
    accept_length = depth_if[best]
    return best, accept_length


def sampling_accept(
    tree: Tree,
    probs: jax.Array,  # [T, V] — processed target probabilities per tree node
    key: jax.Array,
    max_depth: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Temperature>0 acceptance: multi-candidate rejection sampling down the tree.

    Reference semantics (utils.py:453-493): at the current accepted node, iterate
    its children in node order; accept child x with probability p(x); on
    rejection remove x's mass and renormalize.  Renormalize-after-reject has the
    closed form: child_j accepted iff  u_j * (1 - sum_{i<j} p(x_i)) <= p(x_j),
    which we evaluate for all children of the current node at once per depth.

    Returns (best_node, accept_length, residual_probs [V]) where residual_probs
    is the distribution to sample the bonus token from (the renormalized
    leftover if the walk stopped early, else the accepted node's own p —
    utils.py:489-493).
    """
    t = tree.size
    node_ids = jnp.arange(t, dtype=jnp.int32)
    uniforms = jax.random.uniform(key, (max_depth, t))

    def depth_step(d, carry):
        cur, alive, resid_acc = carry
        is_child = (tree.parent == cur) & (node_ids != 0) & (tree.depth == d + 1)
        p_cur = probs[cur]  # [V]
        child_p = jnp.where(is_child, p_cur[tree.tokens], 0.0)
        u = uniforms[d]
        # prefix mass of earlier children (node order == reference row order)
        before = jnp.cumsum(child_p) - child_p
        # child_p > 0 guard: u can be exactly 0.0 (jax uniform is [0,1)),
        # which would otherwise accept a zero-probability child — with
        # one-hot probs (per-request greedy slots) that would break the
        # greedy-equivalence of the walk
        accept = is_child & (child_p > 0) & (
            u * jnp.maximum(1.0 - before, 1e-20) <= child_p)
        any_accept = jnp.any(accept) & alive
        first = jnp.argmax(accept).astype(jnp.int32)  # first True in node order
        new_cur = jnp.where(any_accept, first, cur)
        # capture the residual at the depth where the walk dies
        dies_here = alive & ~any_accept
        resid = _residual(p_cur, tree.tokens, is_child)
        resid_acc = jnp.where(dies_here, resid, resid_acc)
        return new_cur, alive & any_accept, resid_acc

    cur0 = jnp.zeros((), jnp.int32)
    alive0 = jnp.ones((), bool)
    carry = (cur0, alive0, probs[0])
    for d in range(max_depth):
        carry = depth_step(d, carry)
    cur, alive, resid = carry
    # If the walk survived every depth, bonus samples from the last node's p.
    resid = jnp.where(alive, probs[cur], resid)
    accept_length = tree.depth[cur]
    return cur, accept_length, resid


def _residual(p: jax.Array, tokens: jax.Array, is_child: jax.Array) -> jax.Array:
    """p with all child-token mass removed, renormalized (utils.py:486-487)."""
    removed = jnp.zeros_like(p).at[tokens].max(jnp.where(is_child, 1.0, 0.0))
    out = p * (1.0 - removed)
    total = jnp.maximum(jnp.sum(out), 1e-20)
    return out / total
