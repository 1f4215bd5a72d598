"""Registry-wide smoke: every registered processor name instantiates
from a minimal valid config and runs over a small frame — no processor
can be import-broken or config-rotted without this failing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.base import REGISTRY, build_chain

# minimal valid config per registered name (None → covered by a
# dedicated test and needs heavyweight inputs; still asserted present)
CONFIGS: dict[str, dict | None] = {
    "add_fields": {"target": "", "fields": {"env": "prod"}},
    "add_labels": {"labels": {"team": "core"}},
    "add_tags": {"tags": ["t1"]},
    "add_id": {"target_field": "rid"},
    "add_locale": {},
    "add_formatted_index": {"index": "ix-%{[name]}"},
    "add_network_direction": {
        "source": "ip",
        "destination": "ip",
        "internal_networks": ["10.0.0.0/8"],
    },
    "add_data_stream": {},
    "add_constant_metadata": {"values": {"region": "us-east"}},
    "add_host_metadata": {"fields": {"name": "h1"}},
    "add_agent_metadata": {"fields": {"version": "1"}},
    "add_observer_metadata": {"fields": {"name": "o1"}},
    "add_cloud_metadata": {"fields": {"provider": "none"}},
    "add_docker_metadata": {"fields": {"id": "c1"}},
    "add_kubernetes_metadata": {"fields": {"pod": "p1"}},
    "add_process_metadata": {"fields": {"pid": "1"}},
    "append": {"target_field": "tags", "values": ["x"]},
    "normalize_unicode": {"fields": ["name"], "form": "NFC"},
    "cache": {"get": {"key_field": "name", "target_field": "cv"}, "mapping": {"a": "b"}},
    "community_id": None,
    "convert": {"fields": [{"from": "num_s", "to": "num", "type": "long"}]},
    "copy_fields": {"fields": [{"from": "name", "to": "name2"}]},
    "decode_base64_field": {"field": {"from": "b64", "to": "b64d"}},
    "decode_csv_fields": {"fields": {"csvline": "csv_arr"}},
    "decode_duration": {"field": "dur", "format": "seconds"},
    "decode_json_fields": {"fields": ["js"], "schema": "k LONG", "target": ""},
    "decode_xml": {"field": "xml", "target": "doc"},
    "decode_xml_wineventlog": {"field": "xml", "ignore_failure": True},
    "decompress_gzip_field": {"field": {"from": "b64", "to": "gz_out"}},
    "detect_mime_type": {"field": "js", "target": "mime"},
    "dissect": {"tokenizer": "v=%{v}", "field": "kv", "target_prefix": ""},
    "grok": {"field": "kv", "match": "v=%{WORD:gv}"},
    "dns": {"fields": {"ip": "host"}, "mapping": {"10.1.2.3": "db"}},
    "drop_event": {"when": {"equals": {"name": "nope"}}},
    "drop_fields": {"fields": ["spare"]},
    "enrich_lookup": {"key_field": "name", "target_field": "cat", "mapping": {"a": "b"}},
    "extract_array": {"field": "arr", "mappings": {"a0": 0}},
    "extract_field": {"field": "csvline", "separator": ",", "index": 0, "target": "c0"},
    "fingerprint": {"fields": ["name"], "target_field": "fp"},
    "if": None,
    "extract_html_text": {"field": "name", "target": "html_text"},
    "include_fields": {"fields": ["name", "num_s"]},
    "include_message": {"field": "name", "patterns": [".*"]},
    "lowercase": {"values": ["name"]},
    "move_fields": {"to": "m", "fields": ["spare2"]},
    "now": {"fixed": "2026-01-01 00:00:00"},
    "rate_limit": {"limit": 5, "order_by": ["ts"]},
    "redact_pii": {"field": "name", "counts": True},
    "registered_domain": {"field": "domain"},
    "rename": {"fields": [{"from": "spare3", "to": "renamed"}]},
    "replace": {"fields": [{"field": "name", "pattern": "a", "replacement": "b"}]},
    "script": {"lang": "sql", "columns": {"twice": "num_s * 2"}},
    "syslog": {"field": "sys", "format": "rfc3164"},
    "timeseries": {"fields": ["name"]},
    "timestamp": {"field": "ts_s", "target_field": "ts2", "layouts": ["yyyy-MM-dd HH:mm:ss"]},
    "translate_ldap_attribute": {"field": "name", "mapping": {"a": "cn=a"}},
    "translate_sid": {"field": "sid", "mapping": {"S-1": "SYSTEM"}},
    "truncate_fields": {"fields": ["name"], "max_characters": 2},
    "uppercase": {"values": ["name"]},
    "urldecode": {"fields": [{"from": "urlenc", "to": "urldec"}]},
    "canonicalize_url": {"field": "domain", "target": "canon"},
}


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (
                "alpha", "42", "10.1.2.3", "aGk=", "a,b,c", "1h2m",
                '{"k": 5}', "<e><x>1</x></e>", "v=1", "s1", "s2", "s3",
                "svc.example.com", "S-1", "a%20b",
                "<34>Jan  7 03:14:15 host1 app[42]: boom",
                "2026-01-01 00:00:00", [7, 8],
            )
        ],
        "name string, num_s string, ip string, b64 string, csvline string, "
        "dur string, js string, xml string, kv string, spare string, "
        "spare2 string, spare3 string, domain string, sid string, "
        "urlenc string, sys string, ts_s string, arr array<int>",
    ).withColumn("ts", F.to_timestamp("ts_s"))


def test_every_registered_name_has_a_config():
    # "if" is dispatched by make_processor's special case, not REGISTRY
    assert set(CONFIGS) - {"if"} == set(REGISTRY), (
        set(CONFIGS) ^ set(REGISTRY)
    )


@pytest.mark.parametrize(
    "name", sorted(n for n, c in CONFIGS.items() if c is not None)
)
def test_processor_smoke(name, frame):
    out = build_chain([{name: CONFIGS[name]}])(frame)
    rows = out.collect()  # must execute, not just plan
    if name != "drop_event":
        assert len(rows) == 1
