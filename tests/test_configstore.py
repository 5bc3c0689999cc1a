"""Config CRUD parity with the reference's Struct stores, mirroring
mappings_spec.rb / harvest_spec.rb / rules_spec.rb case by case.
No Spark involved — this is driver-side configuration (S9)."""

import json

from marc2rdf_spark.configstore import (
    JsonStore,
    StoredHarvest,
    StoredMapping,
)


def _store(tmp_path):
    return JsonStore(str(tmp_path / "db" / "mappings.json"))


def test_create_with_name_and_description(tmp_path):
    """mappings_spec.rb:7-11."""
    m = StoredMapping(store=_store(tmp_path)).create(
        name="Test mapping", description="A mapping test"
    )
    assert m.name == "Test mapping"
    assert m.description == "A mapping test"


def test_create_assigns_unique_id_ignoring_param(tmp_path):
    """mappings_spec.rb:13-16 — a caller-provided id is ignored."""
    m = StoredMapping(store=_store(tmp_path)).create(
        name="Test mapping", id="A dummy id"
    )
    assert m.id != "A dummy id"
    assert m.id  # a real uuid was assigned
    m2 = StoredMapping(store=_store(tmp_path)).create(name="Other")
    assert m2.id != m.id


def test_save_refuses_empty_mapping(tmp_path):
    """mappings_spec.rb:18-21 — no mapping payload, save -> nil."""
    m = StoredMapping(store=_store(tmp_path)).create(name="Test mapping")
    assert m.save() is None


def test_save_refuses_invalid_mapping(tmp_path):
    """mappings_spec.rb:23-27 — truncated JSON string, save -> nil."""
    m = StoredMapping(store=_store(tmp_path)).create(
        name="Test mapping", mapping='[ { "tags": { "100" }'
    )
    assert m.save() is None


def test_update_cannot_change_id(tmp_path):
    """mappings_spec.rb:29-32 (and harvest_spec.rb:18-22)."""
    m = StoredMapping(store=_store(tmp_path)).create(
        name="Test mapping", mapping={"tags": {}}
    )
    old = m.id
    m.update(id="New dummy id")
    assert m.id == old


def test_save_persists_and_find_round_trips(tmp_path):
    store = _store(tmp_path)
    m = StoredMapping(store=store).create(
        name="Test mapping", mapping={"tags": {"245": {}}}
    )
    assert m.save() is m
    found = store.find(m.id)
    assert found is not None and found["mapping"] == {"tags": {"245": {}}}
    assert store.find("") is None  # mapping.rb:23 nil without id

    m.delete()
    assert store.find(m.id) is None


def test_template_bootstrap(tmp_path):
    """mapping.rb:8-20 — first read copies the template file."""
    template = tmp_path / "template.json"
    template.write_text(json.dumps([{"id": "t1", "name": "seed"}]))
    store = JsonStore(str(tmp_path / "db" / "m.json"), str(template))
    assert store.all() == [{"id": "t1", "name": "seed"}]
    assert (tmp_path / "db" / "m.json").exists()


def test_harvest_crud(tmp_path):
    """harvest_spec.rb:7-23 — same CRUD, no payload gate."""
    store = JsonStore(str(tmp_path / "db" / "harvests.json"))
    h = StoredHarvest(store=store).create(
        name="Test harvester", description="A rule testing harvester"
    )
    assert h.name == "Test harvester"
    assert h.description == "A rule testing harvester"
    h2 = StoredHarvest(store=store).create(tag="Test rule tag", id="A dummy id")
    assert h2.id != "A dummy id"
    old = h.id
    h.update(id="New dummy id")
    assert h.id == old
    assert h.save() is h  # no payload gate for harvesters
    h.delete()
    assert store.find(old) is None
