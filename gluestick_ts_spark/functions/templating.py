"""Env/tenant string templating helpers.

Parity targets in ``src/etl-utils.ts``:

- ``buildStringFormatVariables`` (``etl-utils.ts:101-159``): merge
  reserved kwargs + ``snapshots/tenant-config.json`` metadata + env vars
  (``FLOW``, ``JOB_ID``, ``TAP``, ``CONNECTOR_ID``, ``TENANT``,
  ``ENV_ID``); split tenant on a delimiter into root/sub parts.
- ``formatStrSafely`` (``etl-utils.ts:161-175``): replace ``{key}`` only
  for truthy values; unknown keys stay verbatim (must NOT raise like
  ``str.format`` would).
- ``getIndexSafely`` (``etl-utils.ts:177-183``): ``arr[i] ?? None``.

All driver-side pure Python; no Spark involvement.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Sequence

__all__ = [
    "build_string_format_variables",
    "format_str_safely",
    "get_index_safely",
]

_ENV_VARS = ("FLOW", "JOB_ID", "TAP", "CONNECTOR_ID", "TENANT", "ENV_ID")


def get_index_safely(arr: Sequence[Any] | None, index: int) -> Any:
    """``arr[index]`` or None — mirrors ``etl-utils.ts:177-183``."""
    if arr is None:
        return None
    try:
        return arr[index]
    except (IndexError, TypeError):
        return None


def build_string_format_variables(
    kwargs: dict[str, Any] | None = None,
    use_tenant_metadata: bool = False,
    delimiter: str = "_",
    snapshot_dir: str = "snapshots",
) -> dict[str, Any]:
    """Assemble the template-variable dict (``etl-utils.ts:101-159``).

    Precedence (later wins): env vars < tenant metadata < explicit kwargs.
    ``tenant`` is split on ``delimiter`` into ``root_tenant_id`` /
    ``sub_tenant_id`` (first / second component).
    """
    variables: dict[str, Any] = {}
    for var in _ENV_VARS:
        val = os.environ.get(var)
        if val is not None:
            variables[var.lower()] = val
    tenant = variables.get("tenant")
    if tenant:
        parts = tenant.split(delimiter)
        variables["root_tenant_id"] = get_index_safely(parts, 0)
        variables["sub_tenant_id"] = get_index_safely(parts, 1)

    if use_tenant_metadata:
        cfg_path = os.path.join(snapshot_dir, "tenant-config.json")
        if os.path.isfile(cfg_path):
            try:
                with open(cfg_path, encoding="utf-8") as f:
                    cfg = json.load(f)
                meta = ((cfg.get("hotglue_metadata") or {}).get("metadata")) or {}
                if isinstance(meta, dict):
                    variables.update(meta)
            except (OSError, json.JSONDecodeError):
                pass

    if kwargs:
        variables.update(kwargs)
    return variables


_PLACEHOLDER = re.compile(r"\{([^{}]+)\}")


def format_str_safely(template: str, variables: dict[str, Any]) -> str:
    """Replace ``{key}`` only when ``variables[key]`` is truthy; leave
    unknown/falsy placeholders intact (``etl-utils.ts:161-175``)."""

    def _sub(m: re.Match[str]) -> str:
        key = m.group(1)
        val = variables.get(key)
        return str(val) if val else m.group(0)

    return _PLACEHOLDER.sub(_sub, template)
