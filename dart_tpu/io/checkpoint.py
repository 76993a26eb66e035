"""PPO policy checkpointing via Orbax — the replacement for the torch
`best_agent.pth` / `latest_agent.pth` scheme (`rlmpc2.py:917-922`,
SURVEY.md section 5.4). Same semantics: save latest every episode boundary,
save best on return improvement, load best for eval (falling back to
training when absent, `rlmpc2.py:574-578`)."""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


def _path(d: str, name: str) -> str:
    return os.path.join(os.path.abspath(d), name)


def save_agent(checkpoint_dir: str, name: str, params: Any, opt_state: Any,
               episode: int, episode_return: float):
    """Save {model, optimizer, episode, return} (the reference's dict)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    payload = {
        "params": params,
        "opt_state": opt_state,
        "episode": np.asarray(episode),
        "return": np.asarray(episode_return),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_path(checkpoint_dir, name), payload, force=True)
    ckptr.wait_until_finished()


class CheckpointManager:
    """best/latest tracking (`rlmpc2.py:917-922`)."""

    def __init__(self, checkpoint_dir: str):
        self.dir = checkpoint_dir
        self.best_return = -float("inf")

    def on_episode_end(self, params, opt_state, episode: int,
                       episode_return: float):
        if episode_return > self.best_return:
            self.best_return = episode_return
            save_agent(self.dir, "best_agent", params, opt_state, episode,
                       episode_return)
        save_agent(self.dir, "latest_agent", params, opt_state, episode,
                   episode_return)


def load_agent(checkpoint_dir: str, name: str = "best_agent",
               template: Optional[Any] = None):
    """Load a checkpoint; returns None if absent (eval falls back to
    training mode, `rlmpc2.py:574-578`)."""
    path = _path(checkpoint_dir, name)
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
