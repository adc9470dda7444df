"""Optional orbax checkpoint backend: ecosystem-standard TPU checkpointing.

The native backend (utils/checkpoint.py) writes single-file msgpack PyTrees
with a crc integrity footer — simple, grep-able, ideal on one host and the
default. Orbax is the TPU ecosystem's production checkpointer; selecting
`train.checkpoint_backend: orbax` buys, without changing save cadence or
resume semantics (reference surface: basicsr save/resume reached via
/root/reference/ssr/train.py:41-45,129-133):

- **async commit**: `save()` snapshots the arrays and returns; the write
  drains on a background thread while training continues (the native
  backend blocks the step loop for the full serialize+fsync).
- **atomic directory commits**: a step directory only becomes visible once
  fully written — the same torn-write tolerance the native backend gets
  from its crc footer, including across multi-host filesystems.
- **multi-host coordination**: every process calls save/restore; orbax
  coordinates who writes what (our training state is replicated, so rank 0
  writes and the commit barrier covers everyone).

Layout: `{training_states}/orbax/<step>/` managed by ocp.CheckpointManager.
One payload per step: {"epoch", "iter", "state", "nets": {name: variables}}
— self-contained, so a resume needs no companion net_*.msgpack files.
Reference-format .pth mirrors (logger.save_pth) are still written by
models/base.py regardless of backend.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional, Tuple


def latest_committed_step(root: str) -> Optional[int]:
    """Latest committed orbax step under `root`, WITHOUT importing orbax.

    Used by train.py's resume discovery, which runs before the model exists
    (the fresh-vs-resume decision gates experiment-dir archival). Committed
    step dirs are pure-digit names — in-flight writes carry an
    `.orbax-checkpoint-tmp` suffix until the atomic commit rename, so a
    kill mid-save never surfaces here (the torn-write tolerance the native
    backend gets from its crc footer).
    """
    if not os.path.isdir(root):
        return None
    steps = [int(n) for n in os.listdir(root)
             if n.isdigit() and os.path.isdir(os.path.join(root, n))]
    return max(steps) if steps else None


class OrbaxCheckpointIO:
    """Thin lifecycle wrapper over ocp.CheckpointManager.

    Instantiated lazily by models/base.py when `train.checkpoint_backend:
    orbax`; the import stays inside so the default native path never pays
    orbax's import cost.
    """

    def __init__(self, root: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.root = os.path.abspath(root)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                create=True,
                enable_async_checkpointing=bool(async_save),
            ),
        )
        # A process exiting mid-drain (SIGTERM preemption save, end of
        # train.py) must not tear the async write: block until committed.
        # Last-resort only — finish_checkpoints() is the deliberate drain
        # point; here a commit failure can only be reported, not raised.
        atexit.register(self._wait_at_exit)

    def save(self, step: int, payload: Dict[str, Any]) -> None:
        self._mgr.save(int(step), args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        step = self._mgr.latest_step()
        return None if step is None else int(step)

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None,
                ) -> Optional[Tuple[int, Dict[str, Any]]]:
        """Restore `step` (default: latest committed). None if no checkpoint.

        `template` (a matching PyTree of arrays) restores leaves with the
        template's dtypes/shardings; without it, leaves come back as numpy.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            payload = self._mgr.restore(
                int(step), args=self._ocp.args.StandardRestore(template))
        else:
            payload = self._mgr.restore(int(step))
        return int(step), payload

    def wait(self) -> None:
        """Block until the in-flight async commit lands.

        A failed background write (disk full, serialization error) RAISES
        here — finish_checkpoints() is exactly the place a preemption save
        must surface its failure, not exit "cleanly" and auto-resume from a
        stale step.
        """
        self._mgr.wait_until_finished()

    def _wait_at_exit(self) -> None:
        import sys
        try:
            self._mgr.wait_until_finished()
        except Exception as e:  # already closed / interpreter teardown
            print(f"[orbax] WARNING: async checkpoint drain at exit failed: "
                  f"{e!r}", file=sys.stderr)

    def close(self) -> None:
        atexit.unregister(self._wait_at_exit)
        self._mgr.wait_until_finished()
        self._mgr.close()
