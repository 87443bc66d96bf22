"""Compatibility shim — the checkpoint implementation lives in
io.checkpoint (path-keyed state-pytree npz archives; see that module's
docstring for the design and the reference mapping)."""

from ..io.checkpoint import (  # noqa: F401
    checkpoint_path,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)

__all__ = ["save_state", "load_state", "latest_checkpoint", "checkpoint_path"]

save_state = save_checkpoint
load_state = load_checkpoint
