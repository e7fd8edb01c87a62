"""Multi-host helpers (the ray/accelerate-launch replacement, SURVEY.md §2.6).
Single-host semantics are what CI can check: init is a no-op returning process
0, and the eval shard is the full range."""

from vispec_tpu.parallel.multihost import init_distributed, local_shard


def test_init_distributed_single_host():
    assert init_distributed() == 0


def test_local_shard_single_host_covers_all():
    assert list(local_shard(7)) == list(range(7))
    assert list(local_shard(0)) == []


def test_local_shard_arithmetic():
    """The striping arithmetic across n processes: contiguous, disjoint,
    covering (checked host-side without multiple processes)."""
    import vispec_tpu.parallel.multihost as mh

    class _FakeJax:
        @staticmethod
        def process_count():
            return 3

        process_index = staticmethod(lambda: 1)

    real = mh.jax
    mh.jax = _FakeJax()
    try:
        assert list(mh.local_shard(10)) == [4, 5, 6, 7]
    finally:
        mh.jax = real
