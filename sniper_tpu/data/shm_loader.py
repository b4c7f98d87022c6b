"""Process-staged batch assembly over shared memory.

Round-4 measured the train pipeline at 611.6 ms/step against a ~420 ms
max-stage ideal, attributing the ~190 ms gap to GIL serialization
between the ASSEMBLY thread (cv2 decode / target assign, data/loader)
and the UPLOAD thread (the relay client's Python framing inside
device_put) — two Python-heavy stages in one interpreter
(ARCHITECTURE "Round-4 perf work"). The upload CANNOT leave this
process: jax.Array buffers are client-local, the TPU client is not
fork-safe, and a second process's device_put would land in a different
client whose buffers the training step cannot reference. What CAN
leave is assembly — this module runs the entire ChipLoader in a
spawned child process and ships assembled batches through
multiprocessing.shared_memory, so the training interpreter does ONLY
relay framing + step dispatch. On multi-core hosts this is also the
natural layout (the reference dedicates worker processes to its
iterator, PrefetchingIter.py:54-70, MNIteratorE2E.py:34).

ProcessChipLoader mirrors the ChipLoader surface main_train uses
(reset / __len__ / __iter__), enabled by TRAIN.LOADER_PROCESS.

Protocol (one duplex pipe; depth+1 shm slots allocated on the first
non-empty epoch from the first batch's byte size — shapes are static,
so every batch fits):

  ("reset",)  -> ("reset", n_chips)
  ("len",)    -> ("len", n_batches)
  ("epoch",)  -> ("ready", nbytes|0)   nbytes>0 requests allocation;
                 parent replies ("slots", [names]) iff nbytes>0, then
                 primes depth+1 free-slot ints. Per batch the child
                 recvs a free slot int, writes the arrays, replies
                 ("batch", slot, meta); parent copies the batch out
                 and returns the slot int. ("end",) closes the epoch,
                 after which the child DRAINS exactly depth+1 slot
                 ints (the steady-state pool) so the pipe carries no
                 stale tokens into the next command.

Epochs run to completion; abandoning the iterator mid-epoch
(GeneratorExit) kills the child, and the next call respawns it — the
only in-tree consumer that truncates (main_train's global_min_steps
islice) does so exclusively in multi-host runs, where the spawn cost
is paid once per epoch against a multi-second epoch. Child exceptions
arrive as ("error", traceback) and re-raise in the parent. Batches are
copied out of the slot before the slot is recycled (a ~13 MB memcpy,
~3 ms — noise next to the ~280 ms relay framing).
"""

from __future__ import annotations

import multiprocessing as mp
import traceback
from multiprocessing import shared_memory

import numpy as np

_CTX = mp.get_context("spawn")  # never fork: the parent owns a TPU client


def _child_main(conn, spec, depth):
    """Child entry: run the real ChipLoader, stream batches into shm."""
    slots: list = []
    try:
        from sniper_tpu.data.loader import ChipLoader, load_image_cv2

        (roidb, cfg, batch_size, seed, uint8_data, sparse_targets,
         image_loader) = spec
        loader = ChipLoader(
            roidb, cfg, batch_size, seed=seed, uint8_data=uint8_data,
            sparse_targets=sparse_targets,
            image_loader=image_loader or load_image_cv2,
        )
        n_slots = depth + 1
        while True:
            msg = conn.recv()
            if msg is None:
                break
            if msg[0] == "reset":
                conn.send(("reset", loader.reset()))
            elif msg[0] == "sample":
                # one pickled batch through the pipe (state-matching
                # analog of main_train's next(iter(loader)) shape
                # probe: the loader rng advances by one batch, exactly
                # like the in-process peek)
                conn.send(("sample", next(iter(loader), None)))
            elif msg[0] == "len":
                conn.send(("len", len(loader)))
            elif msg[0] == "epoch":
                it = iter(loader)
                first = next(it, None)
                if first is not None and not slots:
                    total = sum(np.asarray(v).nbytes
                                for v in first.values())
                    conn.send(("ready", total))
                    names = conn.recv()[1]
                    slots = [shared_memory.SharedMemory(name=n)
                             for n in names]
                else:
                    conn.send(("ready", 0))

                def ship(batch):
                    slot = conn.recv()  # free slot int
                    shm = slots[slot]
                    meta, off = [], 0
                    for k, v in batch.items():
                        v = np.ascontiguousarray(v)
                        dst = np.ndarray(v.shape, v.dtype,
                                         buffer=shm.buf, offset=off)
                        dst[...] = v
                        meta.append((k, v.dtype.str, v.shape, off))
                        off += v.nbytes
                    conn.send(("batch", slot, meta))

                if first is not None:
                    ship(first)
                    for batch in it:
                        ship(batch)
                conn.send(("end",))
                # reclaim the steady-state pool: the parent primed
                # n_slots ints and returned one per batch; exactly
                # n_slots remain in flight at epoch end
                for _ in range(n_slots):
                    conn.recv()
    except BaseException:  # noqa: BLE001 — re-raised in the parent
        try:
            conn.send(("error", traceback.format_exc()))
        except BaseException:  # noqa: BLE001 — parent already gone
            pass
    finally:
        for s in slots:
            s.close()
        conn.close()


class ProcessChipLoader:
    """ChipLoader facade whose assembly runs in a spawned process."""

    def __init__(self, roidb, cfg, batch_size, seed=0, uint8_data=True,
                 sparse_targets=True, depth=2, image_loader=None):
        self.depth = depth
        # image_loader must be a picklable top-level callable (spawn);
        # None selects the default cv2 JPEG loader in the child
        self._spec = (roidb, cfg, batch_size, seed, uint8_data,
                      sparse_targets, image_loader)
        self._slots: list[shared_memory.SharedMemory] = []
        self._len = 0
        self.conn = None
        self.proc = None
        self._spawn()

    def _spawn(self):
        self.conn, child_conn = _CTX.Pipe()
        self.proc = _CTX.Process(
            target=_child_main, args=(child_conn, self._spec, self.depth),
            daemon=True,
        )
        self.proc.start()
        child_conn.close()

    def _ensure(self):
        if self.proc is None or not self.proc.is_alive():
            self._release_slots()
            self._spawn()
            # a respawned child re-derives loader state; replay one
            # reset so a chip roll exists. NOTE: the fresh child's rng
            # restarts the epoch-randomization stream, so batch-level
            # determinism across an ABANDONED epoch is not preserved —
            # abandonment only happens on multi-host truncation, where
            # each process's loader is independently seeded anyway.
            if getattr(self, "_was_reset", False):
                self.conn.send(("reset",))
                self._recv()

    def _recv(self):
        msg = self.conn.recv()
        if msg[0] == "error":
            raise RuntimeError(f"loader process failed:\n{msg[1]}")
        return msg

    def reset(self) -> int:
        self._ensure()
        self._was_reset = True
        self.conn.send(("reset",))
        n = self._recv()[1]
        self.conn.send(("len",))
        self._len = self._recv()[1]
        return n

    def sample_batch(self):
        """One batch for shape/state initialization (the in-process
        equivalent is next(iter(loader))). Pickled through the pipe —
        a one-time ~13 MB transfer, not the epoch path."""
        self._ensure()
        self.conn.send(("sample",))
        return self._recv()[1]

    def __len__(self):
        if not self._len:
            self._ensure()
            self.conn.send(("len",))
            self._len = self._recv()[1]
        return self._len

    def __iter__(self):
        self._ensure()
        self.conn.send(("epoch",))
        msg = self._recv()
        assert msg[0] == "ready", msg
        if msg[1]:
            self._release_slots()
            self._slots = [
                shared_memory.SharedMemory(create=True, size=msg[1])
                for _ in range(self.depth + 1)
            ]
            self.conn.send(("slots", [s.name for s in self._slots]))
        for i in range(self.depth + 1):
            self.conn.send(i)
        complete = False
        try:
            while True:
                msg = self._recv()
                if msg[0] == "end":
                    complete = True
                    return
                _, slot, meta = msg
                shm = self._slots[slot]
                batch = {}
                for k, dt, shape, off in meta:
                    src = np.ndarray(shape, np.dtype(dt),
                                     buffer=shm.buf, offset=off)
                    batch[k] = src.copy()  # slot recycled right after
                self.conn.send(slot)
                yield batch
        finally:
            if not complete:
                # mid-epoch abandonment: the protocol state is
                # unrecoverable (child blocked on a slot token) —
                # kill; the next call respawns
                self.proc.terminate()
                self.proc.join()

    def _release_slots(self):
        for s in self._slots:
            try:
                s.close()
                s.unlink()
            except FileNotFoundError:
                pass
        self._slots = []

    def close(self):
        try:
            if self.proc is not None and self.proc.is_alive():
                self.conn.send(None)
                self.proc.join(timeout=5)
                if self.proc.is_alive():
                    self.proc.terminate()
        except (BrokenPipeError, OSError):
            pass
        self._release_slots()

    def __del__(self):
        self.close()
