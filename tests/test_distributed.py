"""Multi-host configuration plumbing (parallel.distributed)."""

from kmers_anno_tpu.parallel.distributed import distributed_env


def test_no_coordinator_is_single_host():
    assert distributed_env({}) is None
    assert distributed_env({"KAN_NUM_PROCESSES": "4"}) is None


def test_kan_vars_win():
    env = {"KAN_COORDINATOR": "10.0.0.1:1234",
           "JAX_COORDINATOR_ADDRESS": "ignored:1",
           "KAN_NUM_PROCESSES": "4", "KAN_PROCESS_ID": "2"}
    assert distributed_env(env) == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4, "process_id": 2}


def test_jax_vars_and_autodetect():
    env = {"JAX_COORDINATOR_ADDRESS": "h0:999"}
    # num_processes / process_index left for auto-detection
    assert distributed_env(env) == {"coordinator_address": "h0:999"}
