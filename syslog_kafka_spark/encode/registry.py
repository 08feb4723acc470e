"""Confluent Schema Registry client (driver-side, cached).

Mirrors the reference's CachedSchemaRegistryClient
(/root/reference Godeps .../elodina/go-kafka-avro/schema_registry.go:101-245):
subject = "<schemaName>-value" (avro_encoder_decoder.go:56-57), REST
endpoints POST /subjects/{subject}/versions and GET /schemas/ids/{id}
(schema_registry.go:32-40), registration cached per (subject, schema).

The HTTP transport is injectable so tests run without a live registry;
urllib is used lazily so no network code executes at import time.
"""

from __future__ import annotations

import json
from collections.abc import Callable

HttpFn = Callable[[str, str, dict | None], dict]


def _default_http(method: str, url: str, payload: dict | None) -> dict:
    import urllib.request

    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        url,
        data=data,
        method=method,
        headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        return json.loads(resp.read())


class SchemaRegistryClient:
    """register/get-by-id with per-subject caching."""

    def __init__(self, base_url: str, http: HttpFn = _default_http) -> None:
        self.base_url = base_url.rstrip("/")
        self._http = http
        self._id_by_subject_schema: dict[tuple[str, str], int] = {}
        self._schema_by_id: dict[int, str] = {}

    def register(self, schema_name: str, schema_json: dict | str) -> int:
        """Register under '<schema_name>-value', returning the schema id."""
        subject = f"{schema_name}-value"
        schema_str = schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
        key = (subject, schema_str)
        if key in self._id_by_subject_schema:
            return self._id_by_subject_schema[key]
        resp = self._http(
            "POST",
            f"{self.base_url}/subjects/{subject}/versions",
            {"schema": schema_str},
        )
        schema_id = int(resp["id"])
        self._id_by_subject_schema[key] = schema_id
        return schema_id

    def get_by_id(self, schema_id: int) -> str:
        if schema_id in self._schema_by_id:
            return self._schema_by_id[schema_id]
        resp = self._http("GET", f"{self.base_url}/schemas/ids/{schema_id}", None)
        self._schema_by_id[schema_id] = resp["schema"]
        return resp["schema"]
