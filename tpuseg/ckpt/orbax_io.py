"""Orbax checkpointing (SURVEY.md C9 + §5 checkpoint/resume).

Replaces the reference's ``torch.save(state_dict)`` with Orbax: async saves of
(params, opt_state) plus a JSON blob carrying step, sampler state and the full
config — everything needed for exact resume (deterministic data iterator +
optimizer state), which the reference cannot do mid-epoch.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any, meta: dict,
             batch_stats: Any = None) -> None:
        parts = dict(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
            meta=ocp.args.JsonSave(meta),
        )
        if batch_stats:
            parts["batch_stats"] = ocp.args.StandardSave(batch_stats)
        self.mgr.save(int(step), args=ocp.args.Composite(**parts))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, params_template: Any, opt_state_template: Any,
                step: Optional[int] = None, batch_stats_template: Any = None):
        """Returns (params, opt_state, meta, batch_stats) at ``step``
        (default: latest); batch_stats is None when not stored."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        parts = dict(
            params=ocp.args.StandardRestore(params_template),
            opt_state=ocp.args.StandardRestore(opt_state_template),
            meta=ocp.args.JsonRestore(),
        )
        if batch_stats_template:
            parts["batch_stats"] = ocp.args.StandardRestore(batch_stats_template)
        out = self.mgr.restore(step, args=ocp.args.Composite(**parts))
        return out["params"], out["opt_state"], out["meta"], out.get("batch_stats")

    def restore_params(self, params_template: Any, step: Optional[int] = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        out = self.mgr.restore(
            step,
            args=ocp.args.Composite(params=ocp.args.StandardRestore(params_template)),
        )
        return out["params"]

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
