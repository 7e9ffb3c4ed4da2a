"""Process-parallel host decode into a shared-memory ring buffer.

The jpeg->boxes path is host-bound once the device program runs at
1800-2500 img/s (docs/PERF.md): a single core decodes ~100-300 JPEG/s, and
Python threads cannot scale the cv2 decode because the surrounding Python
work serializes on the GIL. The reference solves this with torch
DataLoader worker PROCESSES (datasets/detection_dataloader.py:163-172);
this is the framework-native equivalent:

  - N fork()ed worker processes run the user work function (decode +
    letterbox + augment) — no GIL, scales with cores;
  - each worker writes its fixed-shape uint8 output into a preallocated
    SharedMemory slot (zero-copy back to the parent: only the small aux
    payload rides the result queue);
  - the parent reassembles results IN ORDER and recycles slots, so memory
    stays bounded at n_slots regardless of worker skew;
  - determinism is the caller's contract: per-item RNG seeded by
    (seed, epoch, position) exactly like the thread path
    (data/pipeline.py), so thread/process/serial backends produce
    identical batches.

Workers must not touch jax (they only run numpy/cv2) — fork()ing a
process with an initialized TPU client is safe as long as the child never
calls into it. With the 'forkserver'/'spawn' start methods (the default
once jax is imported), standard multiprocessing rules apply: a SCRIPT
driving a process-backed loader must guard its entry point with
`if __name__ == "__main__":`, because children re-import __main__ to
unpickle the work function.
"""
from __future__ import annotations

import atexit
import multiprocessing as mp
import queue as _queue
from collections import deque
from multiprocessing import shared_memory
from typing import Callable, Iterable, Iterator

import numpy as np

_SENTINEL = None


def _worker(work_fn, task_q, result_q, shm_name, slot_shape):
    shm = shared_memory.SharedMemory(name=shm_name)
    slot_bytes = int(np.prod(slot_shape))
    try:
        while True:
            task = task_q.get()
            if task is _SENTINEL:
                break
            pos, slot, item = task
            try:
                out, aux = work_fn(item)
                view = np.ndarray(
                    slot_shape, np.uint8,
                    buffer=shm.buf[slot * slot_bytes : (slot + 1) * slot_bytes],
                )
                if out.shape == tuple(slot_shape):
                    view[...] = out
                    shape = out.shape
                else:  # smaller-than-slot output: write into the corner
                    view[tuple(slice(0, s) for s in out.shape)] = out
                    shape = out.shape
                result_q.put((pos, slot, shape, aux, None))
            except BaseException as e:  # surface the real error in the parent
                result_q.put((pos, slot, None, None, repr(e)))
    finally:
        shm.close()


class DecodePool:
    """Ordered process-parallel map over items, outputs in shared memory.

    work_fn(item) -> (uint8 array with shape <= slot_shape, aux) runs in
    the workers; `imap(items)` yields (view, aux) in submission order. The
    yielded view aliases the ring slot and is valid ONLY until the next
    iteration (copy it into your batch buffer before advancing).

    num_workers=0 degrades to a serial in-process map (same contract), so
    callers can parameterize without branching.
    """

    def __init__(
        self,
        work_fn: Callable,
        num_workers: int,
        slot_shape: tuple[int, ...],
        n_slots: int | None = None,
        start_method: str | None = None,
    ):
        self.work_fn = work_fn
        self.num_workers = int(num_workers)
        self.slot_shape = tuple(int(s) for s in slot_shape)
        self._closed = False
        if self.num_workers <= 0:
            return
        n_slots = n_slots or max(4 * self.num_workers, 8)
        self.n_slots = n_slots
        slot_bytes = int(np.prod(self.slot_shape))
        # 'fork' inherits work_fn/state without pickling;
        # 'forkserver'/'spawn' require a picklable work_fn but avoid
        # forking a multi-threaded parent. Default (None) auto-detects:
        # never fork() once jax is imported (its client threads make fork
        # deadlock-prone), plain fork otherwise (fastest).
        if start_method is None:
            import sys

            start_method = "forkserver" if "jax" in sys.modules else "fork"
        ctx = mp.get_context(start_method)
        self._shm = shared_memory.SharedMemory(
            create=True, size=slot_bytes * n_slots
        )
        self._slot_bytes = slot_bytes
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._procs = [
            ctx.Process(
                target=_worker,
                args=(work_fn, self._task_q, self._result_q,
                      self._shm.name, self.slot_shape),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()
        self._outstanding = 0  # tasks submitted but not yet collected
        atexit.register(self.close)

    # ------------------------------------------------------------------
    def imap(self, items: Iterable) -> Iterator[tuple[np.ndarray, object]]:
        if self.num_workers <= 0:
            for item in items:
                yield self.work_fn(item)
            return

        # a previous imap abandoned mid-flight leaves results (and workers
        # still writing slots) in the pipe — drain them fully before
        # reusing the ring, or stale writes would corrupt fresh slots
        while self._outstanding > 0:
            try:
                self._result_q.get(timeout=30)
            except _queue.Empty:
                dead = [p.pid for p in self._procs if not p.is_alive()]
                if dead:
                    raise RuntimeError(
                        f"DecodePool worker process(es) died: {dead}"
                    ) from None
                continue
            self._outstanding -= 1

        items = iter(items)
        free = deque(range(self.n_slots))
        pending: dict[int, tuple] = {}
        submitted = 0
        next_pos = 0
        done_submitting = False

        def submit_while_possible():
            nonlocal submitted, done_submitting
            while free and not done_submitting:
                try:
                    item = next(items)
                except StopIteration:
                    done_submitting = True
                    return
                self._task_q.put((submitted, free.popleft(), item))
                submitted += 1
                self._outstanding += 1

        submit_while_possible()
        while next_pos < submitted or not done_submitting:
            while next_pos not in pending:
                try:
                    pos, slot, shape, aux, err = self._result_q.get(timeout=30)
                except _queue.Empty:
                    dead = [p.pid for p in self._procs if not p.is_alive()]
                    if dead:  # e.g. OOM-killed: fail loudly, don't hang
                        raise RuntimeError(
                            f"DecodePool worker process(es) died: {dead}"
                        ) from None
                    continue
                self._outstanding -= 1
                if err is not None:
                    raise RuntimeError(f"DecodePool worker failed: {err}")
                pending[pos] = (slot, shape, aux)
            slot, shape, aux = pending.pop(next_pos)
            view = np.ndarray(
                shape, np.uint8,
                buffer=self._shm.buf[slot * self._slot_bytes :
                                     slot * self._slot_bytes
                                     + int(np.prod(shape))],
            )
            next_pos += 1
            yield view, aux
            del view  # drop the buffer reference before the slot recycles
            free.append(slot)
            submit_while_possible()

    # ------------------------------------------------------------------
    def close(self) -> None:
        if self.num_workers <= 0 or self._closed:
            return
        self._closed = True
        for _ in self._procs:
            try:
                self._task_q.put(_SENTINEL)
            except (ValueError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()  # specific child PID, never pattern-matched
                p.join(timeout=5)
        try:
            self._shm.close()
            self._shm.unlink()
        except FileNotFoundError:
            pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
