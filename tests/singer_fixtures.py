"""Synthetic Singer message-log fixtures.

Shapes mirror the Singer spec surface the reference exercises
(three interleaved streams, int/varchar/date-time columns, STATE
bookmarks, ACTIVATE_VERSION, a nested-record stream) with original
stream names and values — the executable conformance spec for the
ingest pipeline.
"""

from __future__ import annotations

import json


def _msg(**kw) -> str:
    return json.dumps(kw, separators=(",", ": "))


USERS_SCHEMA = {
    "properties": {
        "id": {"type": ["null", "integer"], "minimum": -2147483648, "maximum": 2147483647},
        "name": {"type": ["null", "string"], "maxLength": 32},
        "score": {"type": ["null", "number"]},
    },
    "type": ["null", "object"],
    "required": ["id"],
}

CLICKS_SCHEMA = {
    "properties": {
        "id": {"type": ["null", "integer"]},
        "at": {"type": ["null", "string"], "format": "date-time"},
        "meta": {
            "type": ["null", "object"],
            "properties": {
                "page": {"type": ["null", "string"]},
                "depth": {"type": ["null", "integer"]},
                "geo": {
                    "type": ["null", "object"],
                    "properties": {
                        "lat": {"type": ["null", "number"]},
                        "lon": {"type": ["null", "number"]},
                    },
                },
            },
        },
        "tags": {"type": ["null", "array"], "items": {"type": ["null", "string"]}},
    },
    "type": ["null", "object"],
}

SESSIONS_SCHEMA = {
    "properties": {
        "id": {"type": ["null", "integer"]},
        "dur": {"type": ["null", "string"], "format": "time"},
    },
    "type": ["null", "object"],
}


def three_stream_log() -> list[str]:
    """Happy path: three interleaved streams + STATE + ACTIVATE_VERSION."""
    return [
        _msg(type="STATE", value={"bookmarks": {}}),
        _msg(type="SCHEMA", stream="app-users", schema=USERS_SCHEMA, key_properties=["id"]),
        _msg(type="ACTIVATE_VERSION", stream="app-users", version=7),
        _msg(type="RECORD", stream="app-users", record={"id": 1, "name": "ada", "score": 9.5}),
        _msg(type="RECORD", stream="app-users", record={"id": 2, "name": "bo"}),
        _msg(type="STATE", value={"bookmarks": {"app-users": {"id": 2}}}),
        _msg(type="SCHEMA", stream="app-clicks", schema=CLICKS_SCHEMA, key_properties=["id"]),
        _msg(
            type="RECORD",
            stream="app-clicks",
            record={
                "id": 10,
                "at": "2025-03-01T10:00:00Z",
                "meta": {"page": "/home", "depth": 3, "geo": {"lat": 1.5, "lon": -2.5}},
                "tags": ["a", "b"],
            },
        ),
        # interleave back to users (reference would flush-switch here; we don't care)
        _msg(type="RECORD", stream="app-users", record={"id": 3, "name": "cy", "score": 1.25}),
        _msg(
            type="RECORD",
            stream="app-clicks",
            record={"id": 11, "at": "2025-03-01T10:05:00Z", "meta": {"page": "/x"}},
        ),
        _msg(type="SCHEMA", stream="app-sessions", schema=SESSIONS_SCHEMA, key_properties=["id"]),
        _msg(type="RECORD", stream="app-sessions", record={"id": 100, "dur": "04:00:00"}),
        _msg(type="STATE", value={"bookmarks": {"app-users": {"id": 3}, "app-clicks": {"id": 11}}}),
    ]


def invalid_json_log() -> list[str]:
    lines = three_stream_log()[:4]
    lines.insert(3, "this is not json {")
    return lines


def record_before_schema_log() -> list[str]:
    return [
        _msg(type="STATE", value={"bookmarks": {}}),
        _msg(type="RECORD", stream="app-users", record={"id": 1, "name": "ada"}),
        _msg(type="SCHEMA", stream="app-users", schema=USERS_SCHEMA, key_properties=["id"]),
    ]


def validation_failure_log() -> list[str]:
    return [
        _msg(type="SCHEMA", stream="app-users", schema=USERS_SCHEMA, key_properties=["id"]),
        _msg(type="RECORD", stream="app-users", record={"id": 1, "name": "x" * 64}),
    ]


def write_log(tmpdir: str, lines: list[str], name: str = "messages.jsonl") -> str:
    import os

    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def activate_version_logs() -> tuple[list[str], list[str]]:
    """The reference fixture's ACTIVATE_VERSION sequence
    (tests/integration/resources/messages-with-three-streams.json:3,6,10
    — SCHEMA, ACTIVATE_VERSION v, versioned RECORDs), restated as two
    runs: an initial v1 full sync, then a v2 full re-sync whose
    activation must SUPERSEDE v1's rows while the untouched second
    stream keeps its data."""
    run1 = [
        _msg(type="SCHEMA", stream="app-users", schema=USERS_SCHEMA, key_properties=["id"]),
        _msg(type="ACTIVATE_VERSION", stream="app-users", version=1),
        _msg(type="RECORD", stream="app-users", record={"id": 1, "name": "ada"}, version=1),
        _msg(type="RECORD", stream="app-users", record={"id": 2, "name": "bo"}, version=1),
        _msg(type="RECORD", stream="app-users", record={"id": 3, "name": "cy"}, version=1),
        _msg(type="SCHEMA", stream="app-sessions", schema=SESSIONS_SCHEMA, key_properties=["id"]),
        _msg(type="RECORD", stream="app-sessions", record={"id": 100, "dur": "04:00:00"}),
        _msg(type="STATE", value={"bookmarks": {"app-users": {"version": 1}}}),
    ]
    run2 = [
        _msg(type="SCHEMA", stream="app-users", schema=USERS_SCHEMA, key_properties=["id"]),
        _msg(type="RECORD", stream="app-users", record={"id": 2, "name": "bo"}, version=2),
        _msg(type="RECORD", stream="app-users", record={"id": 4, "name": "di"}, version=2),
        _msg(type="ACTIVATE_VERSION", stream="app-users", version=2),
        _msg(type="STATE", value={"bookmarks": {"app-users": {"version": 2}}}),
    ]
    return run1, run2
