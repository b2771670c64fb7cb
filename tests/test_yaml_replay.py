"""Replay the reference's OWN rest-api-spec YAML tests (public spec
test data under rest-api-spec/.../test/) against this engine through
tests/yamlreplay.py.  Every green test here is a reference test
scenario — setup docs, request body and expected response values all
authored by the reference project — passing verbatim on this engine.
Spec features outside our surface skip with the reason."""

from __future__ import annotations

import os

import pytest

from tests.yamlreplay import Runner, Unsupported, load_file, SPEC_DIR

FILES = [
    "search/20_default_values.yml",
    "search/90_search_after.yml",
    "search/360_from_and_size.yml",
    "search/310_match_bool_prefix.yml",
    "search/10_source_filtering.yml",
]

# individual spec tests that exercise surface we deliberately don't
# serve; skipped with the reason so the report stays honest
SKIP = {
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SPEC_DIR), reason="reference spec tests not present"
)


def _cases():
    out = []
    for rel in FILES:
        for name, steps in load_file(rel):
            out.append(pytest.param(rel, name, steps,
                                    id=f"{rel}::{name}"))
    return out


@pytest.mark.parametrize("rel,name,steps", _cases())
def test_yaml_replay(spark, rel, name, steps):
    reason = SKIP.get((rel, name))
    if reason:
        pytest.skip(reason)
    runner = Runner(spark)
    try:
        runner.run(steps)
    except Unsupported as e:
        pytest.skip(str(e))
