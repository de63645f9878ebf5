"""`after-tpu import_dataset`: reference LMDB -> record store migration.

The fixture LMDB is written by a minimal, spec-derived writer (meta pages,
leaf/branch B+tree nodes, overflow pages); the AudioExample payloads are
serialized with the REFERENCE's own generated protobuf module
(/root/reference/after/dataset/audio_example/generated/audio_example_pb2.py),
so the wire-format parser in `dataset/lmdb_import.py` is tested against
google.protobuf's encoder, not against itself.
"""

import importlib.util
import os
import pickle
import struct
import sys
import types

import numpy as np
import pytest

from after_tpu.dataset import AudioExample, RecordReader, SimpleDataset
from after_tpu.dataset.lmdb_import import (LmdbReader, import_lmdb,
                                           midi_from_pretty_midi_pickle,
                                           parse_reference_example)

REF_PB2 = ("/root/reference/after/dataset/audio_example/generated/"
           "audio_example_pb2.py")


def _load_ref_pb2():
    if not os.path.exists(REF_PB2):
        pytest.skip("reference pb2 not available")
    # our own audio_example_pb2 registers a file also named
    # "audio_example.proto" in the default descriptor pool; rename the
    # reference's serialized file (same length) to avoid the collision
    src = open(REF_PB2).read().replace(
        "\\x61udio_example.proto", "\\x61udio_exampl3.proto", 1)
    mod = types.ModuleType("ref_ae_pb2")
    exec(compile(src, REF_PB2, "exec"), mod.__dict__)
    return mod


# ---------------------------------------------------------------------------
# minimal LMDB writer (test fixture; follows the public mdb.c page layout)
# ---------------------------------------------------------------------------

P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = (1 << 64) - 1


def _even(n):
    return n + (n & 1)


def write_minimal_lmdb(path, items, psize=4096):
    """items: sorted list of (key bytes, value bytes)."""
    pages = {}          # pgno -> bytes (first page of overflow chains holds
    next_pg = [2]       # the whole chain)
    n_overflow = [0]

    def alloc(n=1):
        pg = next_pg[0]
        next_pg[0] += n
        return pg

    def page_header(pgno, flags, lower, upper):
        return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)

    def leaf_node(key, val):
        """-> (node_bytes, uses_overflow)"""
        inline = 8 + len(key) + len(val)
        if inline <= psize // 2:
            return struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16,
                               0, len(key)) + key + val, False
        npages = -(-(16 + len(val)) // psize)
        opg = alloc(npages)
        n_overflow[0] += npages
        chain = struct.pack("<QHHI", opg, 0, P_OVERFLOW, npages) + val
        chain += b"\0" * (npages * psize - len(chain))
        pages[opg] = chain
        node = struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16,
                           F_BIGDATA, len(key)) + key + struct.pack("<Q", opg)
        return node, True

    def emit_page(pgno, flags, nodes):
        ptrs, blob, top = [], b"", psize
        for nb in nodes:
            top -= _even(len(nb))
            ptrs.append(top)
            blob = nb + b"\0" * (_even(len(nb)) - len(nb)) + blob
        lower = 16 + 2 * len(nodes)
        body = page_header(pgno, flags, lower, top)
        body += b"".join(struct.pack("<H", p) for p in ptrs)
        body += b"\0" * (top - len(body)) + blob
        assert len(body) == psize
        pages[pgno] = body

    # pack leaves
    leaves = []          # (first_key, pgno, [nodes])
    cur, cur_sz, first_key = [], 16, None
    for key, val in items:
        nb, _ = leaf_node(key, val)
        need = _even(len(nb)) + 2
        if cur and cur_sz + need > psize:
            leaves.append((first_key, alloc(), cur))
            cur, cur_sz = [], 16
        if not cur:
            first_key = key
        cur.append(nb)
        cur_sz += need
    if cur:
        leaves.append((first_key, alloc(), cur))

    for _, pgno, nodes in leaves:
        emit_page(pgno, P_LEAF, nodes)

    if len(leaves) == 1:
        root, depth, n_branch = leaves[0][1], 1, 0
    else:
        root, depth, n_branch = alloc(), 2, 1
        bnodes = []
        for i, (fk, pgno, _) in enumerate(leaves):
            key = b"" if i == 0 else fk
            bnodes.append(struct.pack("<HHHH", pgno & 0xFFFF,
                                      (pgno >> 16) & 0xFFFF, pgno >> 32,
                                      len(key)) + key)
        emit_page(root, P_BRANCH, bnodes)

    last_pg = next_pg[0] - 1

    def mdb_db(pad, depth, branch, leaf, overflow, entries, root):
        return struct.pack("<IHHQQQQQ", pad, 0, depth, branch, leaf,
                           overflow, entries, root)

    def meta(pgno, txnid, root, depth, entries):
        hdr = page_header(pgno, P_META, 16, psize)
        m = struct.pack("<IIQQ", 0xBEEFC0DE, 1, 0, psize * (last_pg + 1))
        m += mdb_db(psize, 0, 0, 0, 0, 0, INVALID)              # free DB
        m += mdb_db(0, depth, n_branch, len(leaves), n_overflow[0],
                    entries, root)                              # main DB
        m += struct.pack("<QQ", last_pg, txnid)
        return hdr + m + b"\0" * (psize - len(hdr) - len(m))

    pages[0] = meta(0, 0, INVALID, 0, 0)
    pages[1] = meta(1, 1, root, depth, len(items))

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        pg = 0
        while pg <= last_pg:
            f.write(pages[pg])
            pg += len(pages[pg]) // psize   # overflow chains span pages


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _fake_pretty_midi_pickle():
    """A pickle structurally identical to pretty_midi.PrettyMIDI, built from
    throwaway fake modules that are REMOVED before unpickling — forcing the
    importer's stub path."""
    pm = types.ModuleType("pretty_midi")
    cont = types.ModuleType("pretty_midi.containers")
    prmod = types.ModuleType("pretty_midi.pretty_midi")

    class Note:
        def __init__(self, velocity, pitch, start, end):
            self.velocity, self.pitch = velocity, pitch
            self.start, self.end = start, end

    class Instrument:
        def __init__(self, notes, is_drum=False):
            self.notes, self.is_drum = notes, is_drum
            self.program = 0

    class PrettyMIDI:
        def __init__(self, instruments):
            self.instruments = instruments
            self.resolution = 220

    Note.__module__ = Instrument.__module__ = "pretty_midi.containers"
    PrettyMIDI.__module__ = "pretty_midi.pretty_midi"
    Note.__qualname__, Instrument.__qualname__ = "Note", "Instrument"
    PrettyMIDI.__qualname__ = "PrettyMIDI"
    cont.Note, cont.Instrument = Note, Instrument
    prmod.PrettyMIDI = PrettyMIDI
    pm.containers, pm.pretty_midi = cont, prmod
    sys.modules.update({"pretty_midi": pm, "pretty_midi.containers": cont,
                        "pretty_midi.pretty_midi": prmod})
    try:
        obj = PrettyMIDI([
            Instrument([Note(90, 60, 0.0, 0.5), Note(70, 64, 0.25, 1.0)]),
            Instrument([Note(127, 36, 0.0, 0.1)], is_drum=True),
        ])
        blob = pickle.dumps(obj)
    finally:
        for name in ("pretty_midi", "pretty_midi.containers",
                     "pretty_midi.pretty_midi"):
            sys.modules.pop(name, None)
    return blob


def _make_reference_records(pb2, n=6, with_midi=True):
    """n reference AudioExamples: int16 waveform (overflow-sized), float32
    z, descriptors (inline-sized), JSON metadata buffer, one pickled midi."""
    rng = np.random.RandomState(0)
    records, arrays = [], []
    for i in range(n):
        ae = pb2.AudioExample()
        wav = (rng.randn(20000) * 8000).astype(np.int16)
        z = rng.randn(16, 64).astype(np.float32)
        centroid = rng.rand(300).astype(np.float32)
        for name, arr, prec in (("waveform", wav, pb2.AudioExample.INT16),
                                ("z", z, pb2.AudioExample.FLOAT32),
                                ("centroid", centroid,
                                 pb2.AudioExample.FLOAT32)):
            buf = ae.buffers[name]
            buf.data = arr.tobytes()
            buf.shape.extend(arr.shape)
            buf.precision = prec
        meta = ae.buffers["metadata"]
        meta.data = ('{"path": "file_%d.wav", "dataset": "fixture"}'
                     % i).encode()
        meta.precision = pb2.AudioExample.INT16   # reference put_buffer quirk
        if with_midi and i == 0:
            mb = ae.buffers["midi"]
            mb.data = _fake_pretty_midi_pickle()
            mb.precision = pb2.AudioExample.INT16
        records.append((f"{i:08d}".encode(), ae.SerializeToString()))
        arrays.append({"waveform": wav, "z": z, "centroid": centroid})
    return records, arrays


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_lmdb_reader_roundtrip(tmp_path):
    pb2 = _load_ref_pb2()
    records, _ = _make_reference_records(pb2, n=6)
    db = str(tmp_path / "ref_db")
    write_minimal_lmdb(db, records)
    with LmdbReader(db) as r:
        assert r.entries == 6
        got = list(r.items())
    assert [k for k, _ in got] == [k for k, _ in records]
    assert all(gv == rv for (_, gv), (_, rv) in zip(got, records))


def test_lmdb_reader_multi_leaf_branch(tmp_path):
    # inline-sized values force several leaf pages under one branch root
    items = [(b"%08d" % i, bytes([i % 251]) * 1500) for i in range(24)]
    db = str(tmp_path / "branch_db")
    write_minimal_lmdb(db, items)
    with LmdbReader(db) as r:
        got = list(r.items())
    assert got == items


def test_wire_parser_matches_reference_pb2(tmp_path):
    pb2 = _load_ref_pb2()
    records, arrays = _make_reference_records(pb2, n=2)
    buffers, metadata = parse_reference_example(records[1][1])
    assert set(buffers) == {"waveform", "z", "centroid", "metadata"}
    wav = np.frombuffer(buffers["waveform"].data, np.int16)
    np.testing.assert_array_equal(wav, arrays[1]["waveform"])
    assert buffers["z"].shape == [16, 64]
    assert buffers["z"].precision == 1      # reference FLOAT32
    assert buffers["waveform"].precision == 3   # reference INT16


def test_pretty_midi_pickle_rescue():
    blob = _fake_pretty_midi_pickle()
    assert "pretty_midi" not in sys.modules
    mid = midi_from_pretty_midi_pickle(blob)
    # the drum instrument is skipped; 2 melodic notes survive
    assert [(n.pitch, n.velocity) for n in mid.notes] == [(60, 90), (64, 70)]
    roll = mid.get_piano_roll(np.linspace(0, 1.0, 10))
    assert roll.shape == (128, 10) and roll.max() > 0


def test_import_dataset_end_to_end(tmp_path):
    pb2 = _load_ref_pb2()
    records, arrays = _make_reference_records(pb2, n=6)
    db = str(tmp_path / "ref_db")
    out = str(tmp_path / "store")
    write_minimal_lmdb(db, records)

    from after_tpu.cli.main import main as cli_main
    assert cli_main(["import_dataset", "--input_path", db,
                     "--output_path", out]) == 0

    reader = RecordReader(out)
    assert len(reader) == 6
    ae = AudioExample(reader.get("00000003"))
    np.testing.assert_allclose(
        ae.get("waveform"),
        arrays[3]["waveform"].astype(np.float32) / (2 ** 15 - 1))
    np.testing.assert_array_equal(ae.get("z"), arrays[3]["z"])
    np.testing.assert_array_equal(ae.get("centroid"), arrays[3]["centroid"])
    meta = ae.get_metadata()
    assert meta["path"] == "file_3.wav" and meta["dataset"] == "fixture"

    # record 0 carries the converted midi, unpicklable as OUR MidiFile
    ae0 = AudioExample(reader.get("00000000"))
    mid = pickle.loads(ae0.get_bytes("midi_bytes"))
    assert [(n.pitch, n.velocity) for n in mid.notes] == [(60, 90), (64, 70)]

    # and the store is a drop-in SimpleDataset input
    ds = SimpleDataset(out, keys=("waveform", "z"), split=None)
    item = ds[2]
    np.testing.assert_array_equal(item["z"], arrays[2]["z"])


def test_import_skips_unparseable_and_overflowing_records(tmp_path):
    """One bad record must not abort a long migration; int64 values that
    would wrap in int32 are rejected per-record, not silently corrupted."""
    pb2 = _load_ref_pb2()
    records, _ = _make_reference_records(pb2, n=3, with_midi=False)

    # a value protobuf can't parse (wire type 7 in the first tag)
    records.insert(1, (b"00000000.garbage", b"\x07\x01\x02"))

    # an int64 buffer whose values exceed the int32 range
    ae = pb2.AudioExample()
    buf = ae.buffers["onsets"]
    arr = np.array([1, 2 ** 31 + 5], np.int64)
    buf.data = arr.tobytes()
    buf.shape.extend(arr.shape)
    buf.precision = pb2.AudioExample.INT64
    records.append((b"zz_int64", ae.SerializeToString()))

    records.sort(key=lambda kv: kv[0])
    db, out = str(tmp_path / "ref_db"), str(tmp_path / "store")
    write_minimal_lmdb(db, records)

    logs = []
    from after_tpu.dataset.lmdb_import import import_lmdb as imp
    n = imp(db, out, log=logs.append)
    assert n == 3                      # the 3 clean records survive
    joined = "\n".join(logs)
    assert "garbage" in joined and "int32 range" in joined
    assert len(RecordReader(out)) == 3


def test_import_int64_within_range_narrows(tmp_path):
    pb2 = _load_ref_pb2()
    ae = pb2.AudioExample()
    arr = np.array([-5, 0, 2 ** 30], np.int64)
    buf = ae.buffers["onsets"]
    buf.data = arr.tobytes()
    buf.shape.extend(arr.shape)
    buf.precision = pb2.AudioExample.INT64
    db, out = str(tmp_path / "db"), str(tmp_path / "store")
    write_minimal_lmdb(db, [(b"k0", ae.SerializeToString())])
    assert import_lmdb(db, out, log=lambda *_: None) == 1
    got = AudioExample(RecordReader(out).get("k0")).get("onsets")
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, arr.astype(np.int32))


def test_truncated_data_mdb_fails_loudly(tmp_path):
    """An overflow chain cut short (partial copy) must raise, not yield a
    silently short value."""
    psize = 4096
    # one record whose 40000-byte value needs a 10-page overflow chain;
    # layout: meta0, meta1, chain pg2-11, leaf pg12 (root)
    db = str(tmp_path / "ref_db")
    write_minimal_lmdb(db, [(b"k0", b"\xab" * 40000)], psize=psize)
    path = os.path.join(db, "data.mdb")
    data = open(path, "rb").read()
    assert len(data) == 13 * psize
    leaf = data[12 * psize:]
    # drop the chain's last 2 pages and move the leaf up to pgno 10,
    # re-pointing the live meta's main-DB root (u64 at meta_off+128) at it
    patched = bytearray(data[:10 * psize] + leaf)
    struct.pack_into("<Q", patched, psize + 128, 10)
    with open(path, "wb") as f:
        f.write(patched)
    with LmdbReader(db) as r:
        with pytest.raises(ValueError, match="EOF|truncated"):
            list(r.items())


def test_non_dict_metadata_json_is_ignored(tmp_path):
    pb2 = _load_ref_pb2()
    ae = pb2.AudioExample()
    z = np.ones((4, 8), np.float32)
    buf = ae.buffers["z"]
    buf.data = z.tobytes()
    buf.shape.extend(z.shape)
    buf.precision = pb2.AudioExample.FLOAT32
    meta = ae.buffers["metadata"]
    meta.data = b"[1, 2, 3]"          # valid JSON, not an object
    db, out = str(tmp_path / "db"), str(tmp_path / "store")
    write_minimal_lmdb(db, [(b"k0", ae.SerializeToString())])
    assert import_lmdb(db, out, log=lambda *_: None) == 1
    np.testing.assert_array_equal(
        AudioExample(RecordReader(out).get("k0")).get("z"), z)
