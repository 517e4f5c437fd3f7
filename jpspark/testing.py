"""Fault-injection test doubles for the storage/commit protocol.

Lives in the package (not the test tree) because these objects ship to
Spark executors inside mapInPandas sinks — workers must be able to
import their class by module path.
"""

from __future__ import annotations

import re

from . import manifest as mf


class StaleReadStorage:
    """Test double for the optimistic-concurrency race window: delegates
    to a real backend but hides every snapshot newer than
    ``visible_version`` from reads until the wrapped writer first
    ATTEMPTS a commit (exclusive create of a root manifest) — exactly
    the interleaving where a rival commit lands between a writer's base
    read and its root create."""

    def __init__(self, inner, visible_version: int):
        self.inner = inner
        self.visible_version = visible_version
        self.stale = True

    def _hidden(self, key: str) -> bool:
        m = re.search(r"manifest-(\d{6})", key)
        return bool(self.stale and m and int(m.group(1)) > self.visible_version)

    def get_text(self, root, key):
        if key == mf.MANIFEST_NAME and self.stale:
            return self.inner.get_text(root, mf._root_key(self.visible_version))
        if self._hidden(key):
            return None
        return self.inner.get_text(root, key)

    def list(self, root, prefix):
        return [k for k in self.inner.list(root, prefix) if not self._hidden(k)]

    def put_text_new(self, root, key, text):
        if mf._is_root_manifest(key):
            self.stale = False  # first commit attempt: rival becomes visible
        return self.inner.put_text_new(root, key, text)

    def __getattr__(self, name):
        if name == "inner":
            raise AttributeError(name)
        return getattr(self.inner, name)
