"""Host-pipeline prefetch: overlap batch building with device compute.

The reference's training loop is fully synchronous (num_workers=0 DataLoader,
train.py:146-151): every iteration pays PIL decode + GT-feature `.npy` load +
host->device transfer before the step can launch. On TPU the jitted step is
dispatched asynchronously, so the natural design is a bounded producer thread
that decodes and `device_put`s batch i+1..i+depth while step i runs on
device — the host never sits between the accelerator and its next batch.

`prefetch` wraps ANY generator; the producer thread runs the generator body
(index sampling, PIL decode, feature gather, jnp.asarray H2D) and the
consumer pops finished batches. Exceptions re-raise at the consumer.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(gen: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Run `gen` on a daemon thread, `depth` items ahead of the consumer.

    depth=0 degrades to plain iteration (useful to A/B the pipeline).
    """
    if depth <= 0:
        yield from gen
        return

    q: queue.Queue = queue.Queue(maxsize=depth)

    def producer():
        try:
            for item in gen:
                q.put(("item", item))
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            q.put(("err", e))
            return
        q.put(("end", _SENTINEL))

    t = threading.Thread(target=producer, daemon=True,
                         name="langsplat4d-batch-prefetch")
    t.start()
    while True:
        tag, item = q.get()
        if tag == "end":
            return
        if tag == "err":
            raise item
        yield item
