"""Multi-source registry (SURVEY.md §2.1 S5; reference
src/utils/config_loader.py:21-50 + config/log_sources.yaml.example).

The reference's YAML lists named log sources with an ``enabled`` flag and
per-source directories; the orchestrator loops over enabled sources.
Here a source maps to an input location + routing rule; ``query`` over a
registry is one job per source over the same session (no subprocesses).

YAML is supported when PyYAML is importable; JSON always works (same
structure).  Example::

    {"log_sources": {
        "fastly_cdn": {"enabled": true, "path": "/data/cdn", "route_by": "status_class"},
        "fastly_media": {"enabled": false, "path": "/data/media"}}}
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class LogSource:
    name: str
    path: str
    enabled: bool = True
    route_by: str = "status_class"
    options: dict = field(default_factory=dict)


def _parse(text: str, suffix: str) -> dict:
    if suffix in (".yaml", ".yml"):
        try:
            import yaml  # type: ignore

            return yaml.safe_load(text)
        except ImportError as e:
            raise RuntimeError(
                "PyYAML not installed; use a .json config (same structure)"
            ) from e
    return json.loads(text)


def load_sources(config_path: str | Path) -> list[LogSource]:
    """Enabled sources, in file order (reference: get_enabled_sources,
    src/utils/config_loader.py:36-50)."""
    p = Path(config_path)
    raw = _parse(p.read_text(), p.suffix.lower())
    out = []
    for name, spec in (raw.get("log_sources") or {}).items():
        src = LogSource(
            name=name,
            path=spec["path"],
            enabled=bool(spec.get("enabled", True)),
            route_by=spec.get("route_by", "status_class"),
            options={k: v for k, v in spec.items()
                     if k not in ("path", "enabled", "route_by")},
        )
        if src.enabled:
            out.append(src)
    return out
