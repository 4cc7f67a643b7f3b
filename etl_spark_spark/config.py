"""Runtime configuration source (SURVEY.md §2 S5).

The reference loads a flat ``.env`` into a dict (``dotenv_values()``,
etl_job.py:128) for bucket URIs and table names. Same capability, no
dependency: environment variables (optionally prefix-filtered) layered
over an optional ``.env``-style file; explicit overrides win.
"""

from __future__ import annotations

import os
from pathlib import Path


def load_config(
    env_file: str | os.PathLike | None = None,
    prefix: str = "",
    overrides: dict[str, str] | None = None,
) -> dict[str, str]:
    """Merge (lowest to highest precedence): ``env_file`` entries,
    process env vars starting with ``prefix`` (prefix stripped),
    ``overrides``."""
    cfg: dict[str, str] = {}
    if env_file:
        for line in Path(env_file).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            cfg[k.strip()] = v.strip().strip("'\"")
    for k, v in os.environ.items():
        if prefix and not k.startswith(prefix):
            continue
        cfg[k[len(prefix):] if prefix else k] = v
    cfg.update(overrides or {})
    return cfg
