"""Driver-side JSON config CRUD store (SURVEY.md §2 S9).

The reference persists mappings / harvesters / rules / libraries as
JSON list files with identical Struct-backed CRUD semantics
(lib/mapping.rb, lib/harvest.rb, lib/rule.rb, lib/library.rb):

 - ``create`` populates the record but ALWAYS assigns a fresh server
   uuid — a caller-provided id is ignored (mapping.rb:28-32,
   mappings_spec.rb:13-16);
 - ``update`` silently drops any attempted id change
   (mapping.rb:35-40, mappings_spec.rb:29-32);
 - ``save`` refuses (returns None) when the payload is missing or not
   valid JSON (mapping.rb:43-46,71-78, mappings_spec.rb:18-27);
 - the db file is bootstrapped from a template on first read
   (mapping.rb:8-20).

This is pure driver-side configuration — loaded once per job, never
shuffled; conversion itself consumes the parsed ``Mapping`` via
``config.load_mapping``.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any, ClassVar


class JsonStore:
    """One JSON list file of records with reference CRUD semantics."""

    def __init__(self, path: str, template: str | None = None):
        self.path = path
        self.template = template

    def all(self) -> list[dict]:
        if not os.path.exists(self.path):
            if self.template and os.path.exists(self.template):
                with open(self.template, encoding="utf-8") as f:
                    data = json.load(f)
                self._write(data)
            else:
                self._write([])
        with open(self.path, encoding="utf-8") as f:
            return json.load(f)

    def find(self, entry_id: str) -> dict | None:
        """mapping.rb:22-25 — nil without an id, match by id."""
        if not entry_id:
            return None
        return next((e for e in self.all() if e.get("id") == entry_id), None)

    def upsert(self, entry: dict) -> dict:
        entries = self.all()
        for i, e in enumerate(entries):
            if e.get("id") == entry["id"]:
                entries[i] = entry
                break
        else:
            entries.append(entry)
        self._write(entries)
        return entry

    def delete(self, entry_id: str) -> list[dict]:
        entries = [e for e in self.all() if e.get("id") != entry_id]
        self._write(entries)
        return entries

    def _write(self, entries: list[dict]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w", encoding="utf-8") as f:
            json.dump(entries, f, indent=2, ensure_ascii=False)


def _valid_json_payload(payload: Any) -> bool:
    """mapping.rb:71-78 validate_mapping: the payload must round-trip
    as JSON.  The spec's invalid case is a truncated JSON *string*, so
    strings are parsed; containers must be JSON-serializable."""
    if payload is None:
        return False
    if isinstance(payload, str):
        try:
            json.loads(payload)
            return True
        except json.JSONDecodeError:
            return False
    try:
        json.dumps(payload)
        return True
    except (TypeError, ValueError):
        return False


@dataclass
class StoredRecord:
    """Struct-CRUD base: Mapping/Harvest/Rule records share this shape;
    subclasses name the JSON payload member that gates ``save``."""

    store: JsonStore | None = None
    id: str = ""
    name: str = ""
    description: str = ""
    extras: dict = field(default_factory=dict)

    # e.g. "mapping"; None = no gate (ClassVar: NOT a dataclass
    # field, else the base default would shadow subclass overrides)
    PAYLOAD_KEY: ClassVar[str | None] = None

    def create(self, **params) -> "StoredRecord":
        """Populate members; the id is ALWAYS a fresh server uuid."""
        params.pop("id", None)
        self.name = params.pop("name", self.name)
        self.description = params.pop("description", self.description)
        self.extras.update(params)
        self.id = str(uuid.uuid4())
        return self

    def update(self, **params) -> "StoredRecord | None":
        """update refuses un-created records and drops id changes."""
        if not self.id:
            return None
        params.pop("id", None)
        self.name = params.pop("name", self.name)
        self.description = params.pop("description", self.description)
        self.extras.update(params)
        return self.save()

    def save(self) -> "StoredRecord | None":
        if self.PAYLOAD_KEY is not None:
            payload = self.extras.get(self.PAYLOAD_KEY)
            if not _valid_json_payload(payload):
                return None
        if self.store is not None:
            self.store.upsert(self.to_dict())
        return self

    def delete(self) -> None:
        if self.store is not None and self.id:
            self.store.delete(self.id)

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "name": self.name,
            "description": self.description,
            **self.extras,
        }


@dataclass
class StoredMapping(StoredRecord):
    """mapping.rb Struct(:id, :name, :description, :mapping)."""

    PAYLOAD_KEY: ClassVar[str | None] = "mapping"


@dataclass
class StoredHarvest(StoredRecord):
    """harvest.rb Struct(:id, :name, :description, :protocol, :url,
    :params, :custom_headers, :local, :remote, :limits) — no payload
    gate (harvest.rb save only requires an id)."""

    PAYLOAD_KEY: ClassVar[str | None] = None
