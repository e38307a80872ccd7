"""Multi-host init helper (parallel/dist.py): env parsing, guarded no-op
behavior, and rank-0 helper — unit-tested via env simulation (an actual
multi-process jax.distributed run needs multiple hosts; SURVEY §2.4)."""


def test_env_parsing():
    from icon_tpu.parallel.dist import distributed_env
    assert distributed_env({}) is None
    cfg = distributed_env({"COORDINATOR_ADDRESS": "10.0.0.2:8476",
                           "NUM_PROCESSES": "4", "PROCESS_ID": "2"})
    assert cfg == {"coordinator_address": "10.0.0.2:8476",
                   "num_processes": 4, "process_id": 2}


def test_single_process_is_noop():
    from icon_tpu.parallel.dist import initialize_distributed
    # no env at all
    assert initialize_distributed(environ={}) is False
    # explicit single-process
    assert initialize_distributed(num_processes=1) is False
    # env describing one process
    assert initialize_distributed(
        environ={"NUM_PROCESSES": "1"}) is False


def test_is_main_process_single_host():
    from icon_tpu.parallel.dist import is_main_process
    assert is_main_process() is True
