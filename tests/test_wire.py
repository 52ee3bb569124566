"""Binary wire codec (core/wire.py): round-trip, compactness, and the
JSON-client compatibility of ndarray-bearing responses."""

import json

import numpy as np

from tpuvdb.core import wire


def test_roundtrip_nested():
    obj = {
        "success": True,
        "records": [
            {"key": "a", "vector": np.arange(8, dtype=np.float32),
             "metadata": {"x": "1"}, "timestamp": 5},
        ],
        "cursor": -1,
        "nested": {"vectors": [[1.0, 2.0], [3.0, 4.0]]},
    }
    out = wire.decode(wire.encode(obj))
    assert out["success"] is True
    np.testing.assert_array_equal(out["records"][0]["vector"],
                                  np.arange(8, dtype=np.float32))
    assert out["records"][0]["vector"].dtype == np.float32
    # float-list fields compactified to f32 arrays
    np.testing.assert_allclose(out["nested"]["vectors"],
                               [[1.0, 2.0], [3.0, 4.0]])
    assert out["cursor"] == -1


def test_float_list_fields_compactified():
    vals = np.random.default_rng(0).standard_normal(768).tolist()
    enc = wire.encode({"vector": vals})
    # raw f32 payload: ~4 bytes/float + framing, far below JSON text
    # (full-precision floats print ~19 chars each in JSON)
    assert len(enc) < 768 * 5
    assert len(enc) < len(json.dumps({"vector": vals})) / 4
    out = wire.decode(enc)
    assert isinstance(out["vector"], np.ndarray)
    assert out["vector"].dtype == np.float32


def test_ragged_vectors_survive():
    out = wire.decode(wire.encode({"vectors": [[1.0, 2.0], [3.0]]}))
    assert len(out["vectors"]) == 2
    np.testing.assert_allclose(out["vectors"][1], [3.0])


def test_json_default_handles_ndarray():
    from tpuvdb.api.server import _json_default

    s = json.dumps({"vector": np.arange(3, dtype=np.float32)},
                   default=_json_default)
    assert json.loads(s)["vector"] == [0.0, 1.0, 2.0]


def test_empty_and_scalar_payloads():
    assert wire.decode(wire.encode({})) == {}
    out = wire.decode(wire.encode({"n": np.int64(7), "f": np.float32(1.5)}))
    assert out["n"] == 7 and abs(out["f"] - 1.5) < 1e-6
