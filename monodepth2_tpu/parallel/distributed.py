"""Multi-host (multi-process) scaffolding: jax.distributed init + per-host
input sharding.

The reference is strictly single-process/single-GPU (src/Monodepth.jl:71;
SURVEY.md §2c) — this layer is the TPU-pod story. Design (scaling-book
recipe): one process per host, `jax.distributed.initialize` wires the
coordinator, the mesh spans ALL devices (ICI within a slice, DCN across
slices handled by the compiler), and each process loads ONLY the slice of
every global batch that lands on its addressable devices
(`jax.make_array_from_process_local_data`). Single-process remains a perfect
degenerate case of every code path, which is how the CPU test suite covers
this without multiple processes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Initialize multi-process JAX when configured; no-op otherwise.

    Configuration comes from the arguments or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). With
    `auto=True` and no explicit configuration, the call is forwarded to
    bare `jax.distributed.initialize()` so Cloud TPU pods auto-detect their
    topology — and a non-pod environment fails loudly instead of silently
    training N independent single-process jobs (the trap the earlier
    `return False` guard created for `cli train --distributed`).
    Returns True if a multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        if process_id is not None:
            # a lone process_id IS explicit (partial) configuration: falling
            # back to single-process here would silently train N independent
            # identically-seeded jobs — the exact trap this function exists
            # to prevent
            raise ValueError(
                "JAX_PROCESS_ID/process_id is set but coordinator_address "
                "and num_processes are not — set JAX_COORDINATOR_ADDRESS "
                "and JAX_NUM_PROCESSES too (or unset JAX_PROCESS_ID for a "
                "single-process run)"
            )
        if not auto:
            return False  # single-process
        jax.distributed.initialize()  # pod auto-detect (raises off-pod)
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple:
    """(process_id, num_processes) — (0, 1) when single-process."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of every global batch this process must load.

    Processes own contiguous equal slices in process_index order — matching
    how a leading-axis NamedSharding lays the global array out over devices
    enumerated process-by-process.
    """
    pid, pcount = process_info()
    if global_batch_size % pcount:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pcount} processes"
        )
    per = global_batch_size // pcount
    return slice(pid * per, (pid + 1) * per)


def shard_host_batch(
    local_batch: np.ndarray, mesh: Mesh, axis: str = "data",
    stacked: bool = False,
):
    """Assemble the global, batch-sharded device array from THIS process's
    local slice (each host feeds only its addressable devices — no host ever
    materializes the global batch).

    local_batch: this process's rows of the global batch (see
    `local_batch_slice`). Single-process: local == global, and this is
    equivalent to `shard_batch`.

    stacked=True for (K, N_local, ...) steps_per_call groups: the scan axis K
    is replicated (every process holds all K micro-batches of its rows), the
    batch axis sharded — the multi-process mirror of `shard_batch(stacked=)`.
    """
    sharding = NamedSharding(mesh, P(None, axis) if stacked else P(axis))
    # batches may be pytrees ({"frames", "K"} per-item-K batches); every leaf
    # shares the leading-axes layout, so one spec fits all
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(sharding, leaf),
        local_batch,
    )


class PerHostSampler:
    """Wraps a dataset so a DataLoader on this process yields only the local
    rows of each global batch, while the global shuffle order stays identical
    on every process (same seed → same permutation).

    Use: loader = DataLoader(PerHostSampler(ds, global_batch), per_host_batch)
    with shuffle=False — the sampler owns the global shuffle so that
    rows [pid·B/P, (pid+1)·B/P) of every global batch land on process pid in
    order, exactly matching `shard_host_batch`'s leading-axis layout.
    """

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        seed: int = 0,
        process_id: Optional[int] = None,
        num_processes: Optional[int] = None,
    ):
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.seed = seed
        pid, pcount = process_info()
        self.process_id = process_id if process_id is not None else pid
        self.num_processes = num_processes if num_processes is not None else pcount
        if global_batch_size % self.num_processes:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{self.num_processes} processes"
            )
        self.per_host = global_batch_size // self.num_processes
        self.epoch = 0
        # per-epoch cache of the global permutation: recomputing it per item
        # is O(n) work per sample / O(n²) per epoch (at KITTI scale ~60M
        # shuffle-element ops per epoch per worker thread)
        self._order_epoch: Optional[int] = None
        self._order: Optional[np.ndarray] = None
        for attr in ("K", "invK", "target_id", "source_ids"):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))
        # probe the rng capability ONCE (see data.loader.accepts_rng): a
        # per-item `except TypeError` would mask genuine TypeErrors inside
        # a two-arg __getitem__ and silently retry without the rng
        from ..data.loader import accepts_rng

        self._takes_rng = accepts_rng(dataset)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n_global_batches = len(self.dataset) // self.global_batch_size
        return n_global_batches * self.per_host

    def _global_order(self) -> np.ndarray:
        if self._order_epoch != self.epoch:
            order = np.arange(len(self.dataset))
            rng = np.random.default_rng([self.seed, self.epoch])
            rng.shuffle(order)
            # assign the cache atomically (tuple-free: readers in loader
            # worker threads only ever see a (epoch, order) pair where the
            # order was fully built before the epoch tag was written)
            self._order = order
            self._order_epoch = self.epoch
        return self._order

    # the sampler derives its own per-item rng (below); DataLoader skips
    # constructing one per item when it sees this flag
    owns_rng = True

    def __getitem__(self, i: int):
        """Local item i -> the matching row of the global shuffled order.

        The augmentation RNG passed down is derived from the GLOBAL index
        (not the loader's local one, which differs per process layout), so a
        given item draws identical augmentations no matter how many
        processes the batch is split across — what makes a 1×N-device run
        bit-equal to a P×(N/P) run.
        """
        gidx = self._global_index(i)
        if not self._takes_rng:
            return self.dataset[gidx]
        rng = np.random.default_rng([self.seed, self.epoch, gidx])
        return self.dataset.__getitem__(gidx, rng)

    def _global_index(self, i: int) -> int:
        if i < 0 or i >= len(self):
            raise IndexError(i)
        gb, r = divmod(i, self.per_host)
        return int(self._global_order()[
            gb * self.global_batch_size + self.process_id * self.per_host + r
        ])

    @property
    def supports_item_K(self) -> bool:
        """Forwarded fail-fast precondition for per_item_K — routed through
        data.dchain.resolves_item_K, the ONE probe function, so this wrapper
        can never diverge from how K is actually resolved."""
        from ..data.dchain import resolves_item_K

        return resolves_item_K(self.dataset)

    def K_of(self, i: int) -> np.ndarray:
        """Per-item intrinsics for LOCAL loader index i — same global-order
        mapping as __getitem__, so {"frames", "K"} batches stay row-aligned
        across any process layout."""
        gidx = self._global_index(i)
        if hasattr(self.dataset, "K_of"):
            return np.asarray(self.dataset.K_of(gidx), np.float32)
        return np.asarray(self.dataset.K, np.float32)
