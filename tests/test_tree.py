"""Unit tests for the static tree algebra (ops/tree.py) with handcrafted trees.

These pin down the semantics the reference implements with host loops:
- build_tree == cnets_ours.py:1167-1191 (global re-rank + parent remap + closure)
- greedy_accept == utils.py:438-451 (longest argmax-matched prefix)
- path_to_root == retrieve_indices row extraction (utils.py:516-517)
- sampling_accept's closed-form == the reject-renormalize loop (utils.py:453-493)
"""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.ops.tree import (
    Tree,
    build_tree,
    greedy_accept,
    path_to_root,
    sampling_accept,
)


def manual_tree(tokens, parent):
    """Build Tree fields from token/parent lists via pure numpy."""
    t = len(tokens)
    mask = np.eye(t, dtype=bool)
    for i in range(1, t):
        mask[i] |= mask[parent[i]]
    depth = mask.sum(1) - 1
    return Tree(
        tokens=jnp.asarray(tokens, jnp.int32),
        parent=jnp.asarray(parent, jnp.int32),
        mask=jnp.asarray(mask),
        depth=jnp.asarray(depth, jnp.int32),
    )


# tree:       0(root, tok 5)
#            /        \
#        1(tok 7)    2(tok 9)
#        /     \         \
#    3(tok 1) 4(tok 2)  5(tok 9)
TOKENS = [5, 7, 9, 1, 2, 9]
PARENT = [0, 0, 0, 1, 1, 2]


def test_greedy_accept_chain():
    tree = manual_tree(TOKENS, PARENT)
    # argmax at node0 = 7 -> accept node1; argmax at node1 = 2 -> accept node4;
    # argmax elsewhere irrelevant
    argmax = jnp.asarray([7, 2, 0, 0, 0, 0], jnp.int32)
    best, acc = greedy_accept(tree, argmax)
    assert int(best) == 4 and int(acc) == 2


def test_greedy_accept_none():
    tree = manual_tree(TOKENS, PARENT)
    argmax = jnp.asarray([8, 8, 8, 8, 8, 8], jnp.int32)  # matches nothing
    best, acc = greedy_accept(tree, argmax)
    assert int(best) == 0 and int(acc) == 0


def test_greedy_accept_requires_connected_prefix():
    tree = manual_tree(TOKENS, PARENT)
    # node4's token matches argmax of node1, but node1 itself not accepted
    argmax = jnp.asarray([9, 2, 4, 0, 0, 0], jnp.int32)  # root argmax=9 -> node2
    best, acc = greedy_accept(tree, argmax)
    assert int(best) == 2 and int(acc) == 1


def test_path_to_root():
    tree = manual_tree(TOKENS, PARENT)
    path = path_to_root(tree, jnp.asarray(4, jnp.int32), 4)
    assert np.asarray(path)[:3].tolist() == [0, 1, 4]
    # padding past the node's depth repeats the node itself
    assert int(path[3]) == 4


def test_build_tree_parent_remap():
    # candidate pool: 3 flat candidates; select 2 best; parents via 1-based flat idx
    sample = jnp.asarray(11, jnp.int32)
    tokens_flat = jnp.asarray([100, 101, 102], jnp.int32)
    scores_flat = jnp.asarray([-0.1, -5.0, -0.2], jnp.float32)
    # candidate0: child of root; candidate2: child of candidate0 (flat idx 0 -> 1-based 1)
    parent1 = jnp.asarray([0, 0, 1], jnp.int32)
    tree = build_tree(sample, tokens_flat, scores_flat, parent1, total_tokens=3, max_depth=2)
    assert np.asarray(tree.tokens).tolist() == [11, 100, 102]
    assert np.asarray(tree.parent).tolist() == [0, 0, 1]
    assert np.asarray(tree.depth).tolist() == [0, 1, 2]
    expected_mask = [[1, 0, 0], [1, 1, 0], [1, 1, 1]]
    assert np.asarray(tree.mask).astype(int).tolist() == expected_mask


def test_sampling_accept_deterministic_extremes():
    """p(child)=1 -> always accept; p=0 -> never; residual renormalizes."""
    tree = manual_tree(TOKENS, PARENT)
    vocab = 12
    probs = np.full((6, vocab), 1e-9, np.float32)
    probs[0, 7] = 1.0  # root: all mass on node1's token
    probs[1, 2] = 1.0  # node1: all mass on node4's token
    probs[4, 3] = 1.0  # node4 (no children): bonus dist
    probs = jnp.asarray(probs / probs.sum(-1, keepdims=True))
    best, acc, resid = sampling_accept(tree, probs, jax.random.PRNGKey(0), max_depth=3)
    assert int(best) == 4 and int(acc) == 2
    # walk survived to a leaf -> residual is the leaf's own distribution
    assert int(jnp.argmax(resid)) == 3


def test_sampling_accept_reject_residual():
    tree = manual_tree(TOKENS, PARENT)
    vocab = 12
    probs = np.full((6, vocab), 1e-9, np.float32)
    # root: children tokens are 7 and 9; give them zero mass -> always reject;
    # leftover mass on token 4 -> residual must be ~all on 4
    probs[0, 4] = 1.0
    probs = jnp.asarray(probs / probs.sum(-1, keepdims=True))
    best, acc, resid = sampling_accept(tree, probs, jax.random.PRNGKey(1), max_depth=3)
    assert int(best) == 0 and int(acc) == 0
    assert int(jnp.argmax(resid)) == 4
    np.testing.assert_allclose(float(resid.sum()), 1.0, rtol=1e-5)


def np_reference_accept(tree_tokens, tree_parent, tree_depth, probs, rng, max_depth):
    """Sequential NumPy implementation of the reference's reject-renormalize
    walk (utils.py:453-493): at the accepted node, iterate children in node
    order; accept child x with prob p(x); on reject zero x's mass and
    renormalize.  Returns (best, acc, residual)."""
    t = len(tree_tokens)
    cur = 0
    for d in range(max_depth):
        children = [i for i in range(1, t)
                    if tree_parent[i] == cur and tree_depth[i] == d + 1]
        gtp = probs[cur].astype(np.float64).copy()
        gtp /= gtp.sum()
        accepted = None
        for c in children:
            x = tree_tokens[c]
            if rng.uniform() <= gtp[x]:
                accepted = c
                break
            gtp[x] = 0.0
            s = gtp.sum()
            gtp = gtp / s if s > 0 else gtp
        if accepted is None:
            return cur, d, gtp
        cur = accepted
    return cur, int(tree_depth[cur]), probs[cur].astype(np.float64)


def test_sampling_accept_distribution_matches_sequential_reference():
    """The closed-form accept (u * (1 - prefix_mass) <= p) must induce the same
    outcome distribution as the reference's sequential reject-renormalize loop
    over many trials (different RNG streams => compare distributions)."""
    tree = manual_tree(TOKENS, PARENT)
    vocab = 12
    rng = np.random.default_rng(3)
    p = rng.uniform(0.05, 1.0, (6, vocab))
    p = (p / p.sum(-1, keepdims=True)).astype(np.float32)
    probs = jnp.asarray(p)

    trials = 4000
    keys = jax.random.split(jax.random.PRNGKey(11), trials)
    batched = jax.jit(jax.vmap(lambda k: sampling_accept(tree, probs, k, 3)[:2]))
    bests, accs = map(np.asarray, batched(keys))

    ref_counts = np.zeros(6)
    rng2 = np.random.default_rng(7)
    for _ in range(trials):
        b, a, _ = np_reference_accept(TOKENS, PARENT, np.asarray(tree.depth), p, rng2, 3)
        ref_counts[b] += 1
    ours_counts = np.bincount(bests, minlength=6)
    # best-node distribution within ~4 sigma of binomial noise
    for i in range(6):
        pr = ref_counts[i] / trials
        sigma = np.sqrt(max(pr * (1 - pr) / trials, 1e-9))
        assert abs(ours_counts[i] / trials - pr) < 4 * sigma + 0.01, (
            i, ours_counts / trials, ref_counts / trials)


def test_sampling_accept_matches_target_distribution():
    """Depth-1 chain: acceptance + residual sampling must reproduce the target
    distribution p over many trials (the speculative-sampling correctness
    property the reference relies on)."""
    vocab = 4
    # root with 2 children carrying tokens 0 and 1
    tree = manual_tree([9, 0, 1], [0, 0, 0])
    p = np.asarray([0.4, 0.3, 0.2, 0.1], np.float32)
    probs = jnp.asarray(np.tile(p, (3, 1)))
    counts = np.zeros(vocab)
    trials = 3000
    keys = jax.random.split(jax.random.PRNGKey(42), trials)

    batched = jax.jit(
        jax.vmap(lambda k: sampling_accept(tree, probs, k, 1))
    )
    bests, accs, resids = batched(keys)
    bests, accs = np.asarray(bests), np.asarray(accs)
    resids = np.asarray(resids)
    # sample the outcome token: accepted child's token, else bonus from residual
    bonus_keys = jax.random.split(jax.random.PRNGKey(7), trials)
    from vispec_tpu.ops.sampling import sample_categorical

    bonus = np.asarray(
        jax.jit(jax.vmap(sample_categorical))(bonus_keys, jnp.asarray(resids))
    )
    toks = np.where(accs > 0, np.asarray([9, 0, 1])[bests], bonus)
    for v in range(vocab):
        counts[v] = (toks == v).sum()
    freq = counts / trials
    np.testing.assert_allclose(freq, p, atol=0.035)
