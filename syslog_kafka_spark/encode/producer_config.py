"""File-based producer configuration.

Reference parity: ProducerConfigFromFile (siesta-producer
kafka_producer.go:158-205) loads a java-properties map and applies the
recognized keys over NewProducerConfig() defaults. Same shape here: parse
``key=value`` lines, surface the keys the Spark Kafka sink can honor, and
let explicit CLI flags override file values (file > built-in defaults,
flags > file).

Recognized keys (same names as the reference):
  bootstrap.servers / metadata.broker.list  -> broker list
  acks                                      -> required acks
  timeout.ms                                -> ack timeout (ms)
  linger                                    -> linger (Go duration or ms)
  batch.size                                -> batch size
  compression.type                          -> codec
  client.id                                 -> client id (passed through)

Unrecognized keys are returned untouched under ``extra`` so callers can
forward them as raw ``kafka.*`` options if desired.
"""

from __future__ import annotations

import re

_DURATION_RE = re.compile(r"^(\d+(?:\.\d+)?)(ms|s|m|h)?$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, None: 1}


def parse_duration_ms(value: str) -> int:
    """Go-style duration ('100ms', '1s', '2m') or a bare number (ms)."""
    m = _DURATION_RE.match(value.strip())
    if not m:
        raise ValueError(f"unparseable duration {value!r}")
    return int(float(m.group(1)) * _UNIT_MS[m.group(2)])


def load_properties(path: str) -> dict[str, str]:
    """Minimal java-properties subset: key=value lines, #/! comments,
    surrounding whitespace stripped — what cfg.LoadNewMap accepts for the
    reference's producer files."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" not in line:
                raise ValueError(f"invalid properties line {raw!r}")
            k, v = line.split("=", 1)
            props[k.strip()] = v.strip()
    return props


def producer_settings_from_file(path: str) -> dict:
    """Translate a reference producer properties file into the engine's
    producer-knob names (kafka_producer.go:158-205 key set)."""
    props = load_properties(path)
    out: dict = {"extra": {}}
    for key, value in props.items():
        if key in ("bootstrap.servers", "metadata.broker.list"):
            # bootstrap.servers wins when both are present (reference
            # checks metadata.broker.list only if the list is still empty)
            if key == "bootstrap.servers" or "broker_list" not in out:
                out["broker_list"] = value
        elif key == "acks":
            out["required_acks"] = int(value)
        elif key == "timeout.ms":
            out["acks_timeout"] = int(value)
        elif key == "linger":
            out["linger_ms"] = parse_duration_ms(value)
        elif key == "batch.size":
            out["batch_size"] = int(value)
        elif key == "compression.type":
            out["compression"] = value
        elif key == "client.id":
            out["client_id"] = value
        else:
            out["extra"][key] = value
    return out
