#!/usr/bin/env python3
"""Cross-validate graft's KartothekInterop against the REFERENCE CODE
itself (/root/reference, public), run with lightweight shims for its store
dependencies (simplekv/simplejson/urlquote/...; see tools/ktkshim).

  write <dir>  -- the reference writes a real v4 dataset 'ref_ds' into <dir>
                  (metadata JSON via DatasetMetadataBuilder, payload parquet
                  via ParquetSerializer, _common_metadata via
                  store_schema_metadata, one external secondary index)
  read  <dir>  -- the reference loads 'our_ds' (written by
                  graft.ktk.KartothekInterop.write) via
                  DatasetMetadata.load_from_store and validates metadata,
                  schema and payload

Driver-side rehearsal only (python is NOT a dependency of the library).
Full sequence:
  PYTHONPATH=tools/ktkshim:/root/reference python3 tools/interop_crosscheck.py write /tmp/xval
  sbt "Test/runMain graft.tools.InteropCrossCheck /tmp/xval"
  PYTHONPATH=tools/ktkshim:/root/reference python3 tools/interop_crosscheck.py read /tmp/xval
"""
import sys

import pandas as pd

from kartothek.core.common_metadata import (
    make_meta,
    read_schema_metadata,
    store_schema_metadata,
)
from kartothek.core.dataset import DatasetMetadata, DatasetMetadataBuilder
from kartothek.core.index import ExplicitSecondaryIndex
from kartothek.core.partition import Partition
from kartothek.serialization import ParquetSerializer
from simplekv import KeyValueStore


def write(root):
    store = KeyValueStore(root)
    uuid = "ref_ds"
    ser = ParquetSerializer()
    parts = {
        "p=1/part0": pd.DataFrame({"l": ["a", "b"], "v": [1.0, 2.0], "tag": ["x", "y"]}),
        "p=2/part1": pd.DataFrame({"l": ["c"], "v": [3.0], "tag": ["x"]}),
        "p=3/part2": pd.DataFrame({"l": ["d"], "v": [4.0], "tag": ["z"]}),
    }
    builder = DatasetMetadataBuilder(
        uuid=uuid, metadata_version=4, partition_keys=["p"],
        table_meta={"table": make_meta(next(iter(parts.values())), origin="t", partition_keys=["p"])},
    )
    index_dct = {}
    for label, df in parts.items():
        key = ser.store(store, "{}/table/{}".format(uuid, label), df)
        builder.add_partition(label, Partition(label, files={"table": key}))
        for tag in df["tag"]:
            index_dct.setdefault(tag, set()).add(label)
    idx = ExplicitSecondaryIndex(
        column="tag", index_dct={k: sorted(v) for k, v in index_dct.items()})
    storage_key = idx.store(store, uuid)
    builder.add_external_index("tag", storage_key)
    store_schema_metadata(
        make_meta(next(iter(parts.values())), origin="t", partition_keys=["p"]),
        uuid, store, "table")
    meta_key, blob = builder.to_json()
    store.put(meta_key, blob)
    print("reference wrote", meta_key, "partitions:", len(parts))


def write_multi(root):
    """The DEPRECATED-but-real multi-table v4 form (metapartition.py:77-333):
    each partition carries one file per table; tables have different schemas.
    """
    store = KeyValueStore(root)
    uuid = "ref_multi"
    ser = ParquetSerializer()
    core = {
        "p=1/part0": pd.DataFrame({"id": [1, 2], "v": [1.0, 2.0]}),
        "p=2/part1": pd.DataFrame({"id": [3], "v": [3.0]}),
    }
    aux = {
        "p=1/part0": pd.DataFrame({"id": [1, 2], "note": ["a", "b"]}),
        "p=2/part1": pd.DataFrame({"id": [3], "note": ["c"]}),
    }
    builder = DatasetMetadataBuilder(
        uuid=uuid, metadata_version=4, partition_keys=["p"],
        table_meta={
            "core": make_meta(next(iter(core.values())), origin="c", partition_keys=["p"]),
            "aux": make_meta(next(iter(aux.values())), origin="a", partition_keys=["p"]),
        },
    )
    for label in core:
        files = {
            "core": ser.store(store, "{}/core/{}".format(uuid, label), core[label]),
            "aux": ser.store(store, "{}/aux/{}".format(uuid, label), aux[label]),
        }
        builder.add_partition(label, Partition(label, files=files))
    store_schema_metadata(
        make_meta(next(iter(core.values())), origin="c", partition_keys=["p"]),
        uuid, store, "core")
    store_schema_metadata(
        make_meta(next(iter(aux.values())), origin="a", partition_keys=["p"]),
        uuid, store, "aux")
    meta_key, blob = builder.to_json()
    store.put(meta_key, blob)
    print("reference wrote multi-table", meta_key, "tables: core, aux")


def read(root):
    store = KeyValueStore(root)
    ds = DatasetMetadata.load_from_store("our_ds", store, load_schema=True,
                                         load_all_indices=True)
    assert ds.metadata_version == 4, ds.metadata_version
    assert ds.partition_keys == ["p"], ds.partition_keys
    assert len(ds.partitions) == 2, ds.partitions
    for label, part in ds.partitions.items():
        assert "table" in part.files, part.files
        key = part.files["table"]
        assert store.get(key), key
    # schema loads from our _common_metadata and has the payload columns
    fields = {f.name for f in ds.schema.internal()}
    assert {"l", "tag", "v"} <= fields, fields
    # our embedded index round-trips through the reference's index class
    assert "tag" in ds.indices, ds.indices.keys()
    idx = ds.indices["tag"]
    labels = idx.query("y")
    assert len(labels) == 1, labels
    # the payload parquet is readable by the reference's own serializer,
    # with predicate pushdown
    df = ParquetSerializer.restore_dataframe(
        store, ds.partitions[labels[0]].files["table"],
        predicates=[[("tag", "==", "y")]])
    assert list(df["l"]) == ["b"], df
    print("reference loaded our_ds OK: partitions",
          sorted(ds.partitions), "index labels for tag=y:", labels)

    # the EXTERNAL-index export form: the reference resolves the storage
    # key from the blob, loads our .by-dataset-index.parquet, and queries it
    ds_ext = DatasetMetadata.load_from_store("our_ds_ext", store, load_schema=True,
                                             load_all_indices=True)
    assert "tag" in ds_ext.indices, ds_ext.indices.keys()
    ext_labels = ds_ext.indices["tag"].query("y")
    assert len(ext_labels) == 1, ext_labels
    df_ext = ParquetSerializer.restore_dataframe(
        store, ds_ext.partitions[ext_labels[0]].files["table"],
        predicates=[[("tag", "==", "y")]])
    assert list(df_ext["l"]) == ["b"], df_ext
    print("reference loaded our_ds_ext OK via the external index:", ext_labels)


def read_multi(root):
    """The reference loads the MULTI-TABLE dataset graft wrote with
    KartothekInterop.writeMulti: both tables' schemas resolve from their
    own _common_metadata, every partition carries one file per table, and
    the payload restores through the reference serializer.
    """
    store = KeyValueStore(root)
    ds = DatasetMetadata.load_from_store("our_multi", store, load_schema=True)
    assert ds.metadata_version == 4, ds.metadata_version
    assert ds.partition_keys == ["p"], ds.partition_keys
    assert sorted(ds.tables) == ["aux", "core"], ds.tables
    assert len(ds.partitions) == 2, sorted(ds.partitions)
    for label, part in ds.partitions.items():
        assert set(part.files) == {"aux", "core"}, (label, part.files)
        for key in part.files.values():
            assert store.get(key), key
    core_fields = {f.name for f in read_schema_metadata("our_multi", store, "core").internal()}
    aux_fields = {f.name for f in read_schema_metadata("our_multi", store, "aux").internal()}
    assert {"p", "id", "v"} <= core_fields, core_fields
    assert {"p", "id", "note"} <= aux_fields, aux_fields
    rows = []
    for label in sorted(ds.partitions):
        df_core = ParquetSerializer.restore_dataframe(store, ds.partitions[label].files["core"])
        df_aux = ParquetSerializer.restore_dataframe(store, ds.partitions[label].files["aux"])
        assert len(df_core) == len(df_aux), (label, len(df_core), len(df_aux))
        rows.append(len(df_core))
    assert sum(rows) == 3, rows
    print("reference loaded our_multi OK: tables", sorted(ds.tables),
          "partitions", sorted(ds.partitions), "rows per partition:", rows)


if __name__ == "__main__":
    {"write": write, "write_multi": write_multi, "read": read,
     "read_multi": read_multi}[sys.argv[1]](sys.argv[2])
