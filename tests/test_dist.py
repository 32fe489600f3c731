"""Multi-host helpers: deterministic sharding and output suffixing."""
from deepsignal_plant_tpu.parallel.dist import (host_output_path,
                                                init_distributed,
                                                process_info,
                                                shard_for_host)


def test_shard_for_host_partitions_completely():
    items = [f"f{i:03d}.fast5" for i in range(10)]
    shards = [shard_for_host(items, pid, 3) for pid in range(3)]
    # complete, disjoint cover
    merged = sorted(sum(shards, []))
    assert merged == sorted(items)
    assert all(len(s) >= 3 for s in shards)
    # deterministic regardless of input (filesystem listing) order
    assert shard_for_host(list(reversed(items)), 1, 3) == \
        shard_for_host(items, 1, 3)


def test_shard_single_process_is_identity():
    items = ["a", "b", "c"]
    assert shard_for_host(items, 0, 1) == items


def test_process_info_single():
    pid, pcount = process_info()
    assert pid == 0 and pcount == 1


def test_host_output_path_single_process():
    assert host_output_path("/x/y/calls.tsv") == "/x/y/calls.tsv"


def test_init_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    init_distributed()  # must not raise in single-process env
