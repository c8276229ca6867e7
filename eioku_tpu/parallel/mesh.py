"""Device mesh + sharding policies.

The reference has no device-level parallelism at all — its only parallelism is
queue fan-out and worker concurrency (SURVEY.md section 2.4); intra-task compute
is a sequential frame loop on one GPU. Here the TPU answer is explicit: one
shared 2D mesh ("data", "model") per process, batch sharded over "data"
(pure DP for the conv/detection pipelines — batches of frames are embarrassingly
data-parallel), and tensor-parallel sharding over "model" for the transformer
families (attention heads + FFN split, Megatron-style column/row pairs), with
XLA inserting the all-reduces over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """2D mesh (data, model) over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % model_parallel != 0:
        raise ValueError("n_devices must be divisible by model_parallel")
    grid = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Batch dimension over the data axis (inputs/activations)."""
    return NamedSharding(mesh, P("data"))


def shard_yolo_params(params, mesh: Mesh):
    """YOLO is pure DP: params replicated, batch sharded. Conv channel counts in
    the small variants don't amortize TP collectives; throughput scaling comes
    from frame-batch sharding."""
    return jax.device_put(params, replicated(mesh))


def _minilm_spec(path: tuple, leaf) -> P:
    """Megatron-style TP for the transformer: q/k/v/ffn1 split output dim
    (column), o/ffn2 split input dim (row); embeddings split vocab; everything
    else replicated."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    joined = "/".join(str(k) for k in keys)
    if joined.endswith(("q/w", "k/w", "v/w", "ffn1/w")):
        return P(None, "model")
    if joined.endswith(("q/b", "k/b", "v/b", "ffn1/b")):
        return P("model")
    if joined.endswith(("o/w", "ffn2/w")):
        return P("model", None)
    if joined == "tok_emb":
        return P("model", None)
    return P()


def shard_minilm_params(params, mesh: Mesh):
    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _minilm_spec(path, leaf)), params)
    return jax.device_put(params, specs)


_distributed_initialized = False


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host bootstrap (SURVEY.md §2.4 P3: one JAX process per host over
    DCN; the control plane stays the job queue, exactly as the reference
    scales by pointing N worker containers at one Redis).

    Reads EIOKU_COORDINATOR / EIOKU_NUM_PROCESSES / EIOKU_PROCESS_ID when
    arguments are omitted. Returns True when a multi-process runtime was
    initialized, False for the single-host no-op (no coordinator configured).
    After initialization, jax.devices() spans all hosts and make_mesh() builds
    a global mesh whose collectives ride ICI within a slice and DCN across.
    """
    import os

    global _distributed_initialized
    if _distributed_initialized:
        return True
    coordinator = coordinator or os.environ.get("EIOKU_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("EIOKU_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("EIOKU_PROCESS_ID", "0"))
    if not 0 <= process_id < num_processes:
        raise ValueError(
            f"process_id {process_id} out of range for {num_processes}")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _distributed_initialized = True
    return True
