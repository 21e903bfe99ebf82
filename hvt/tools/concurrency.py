"""Thread-pool helper for parallel file operations
(reference tools/concurrency.py:9-35)."""

from __future__ import annotations

import concurrent.futures

from tqdm.auto import tqdm


class BoundedExecutor:
    """Thin ThreadPoolExecutor wrapper that tracks submitted futures and
    reports progress on finish()."""

    def __init__(self, pool_cls=concurrent.futures.ThreadPoolExecutor):
        self._pool = pool_cls()
        self._futures: list[concurrent.futures.Future] = []

    def submit(self, fn, *args, **kwargs):
        self._futures.append(self._pool.submit(fn, *args, **kwargs))

    def finish(self, *, desc: str = ""):
        results = [
            f.result()
            for f in tqdm(
                concurrent.futures.as_completed(self._futures),
                total=len(self._futures),
                desc=desc,
            )
        ]
        self._futures.clear()
        return results

    def shutdown(self, **kwargs):
        self._pool.shutdown(wait=False, cancel_futures=True, **kwargs)
