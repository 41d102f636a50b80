"""Parameter checkpointing (orbax) for the extractor/matcher networks.

The reference has no checkpoint/resume at all — weights are baked into its
Docker image (SURVEY.md section 5). Here trained (or converted) parameters
persist via orbax and reload into any pipeline mode.
"""
from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_params", "load_params", "latest_step"]


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_params(directory: str, step: int, params: Any) -> None:
    """Save a params pytree as checkpoint ``step`` under ``directory``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(params))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory)
    return mgr.latest_step()


def load_params(directory: str, step: Optional[int] = None,
                like: Any = None) -> Any:
    """Restore a params pytree (latest step by default).

    :param like: optional template pytree for shape/dtype restoration
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    if like is not None:
        return mgr.restore(step, args=ocp.args.StandardRestore(like))
    return mgr.restore(step)
