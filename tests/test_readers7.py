"""Binary partition / cover sidecar I/O round-trips (readers7;
reference io/BinaryPartition*, BinaryEdgeListPartition*,
EdgeListCoverReader, SNAPEdgeListPartitionReader, DotPartitionWriter)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.sources import readers7 as r7


def _partition(spark, rows):
    return spark.createDataFrame(rows, "id LONG, subset LONG")


def test_binary_partition_roundtrip(spark, tmp_path):
    p = _partition(spark, [(0, 2), (1, 0), (2, 2), (3, 1)])
    for width in (4, 8):
        f = str(tmp_path / f"p{width}.bin")
        r7.write_binary_partition(p, f, width=width)
        import os

        assert os.path.getsize(f) == 4 * width
        back = r7.read_binary_partition(spark, f, width=width)
        assert sorted(map(tuple, back.collect())) == [(0, 2), (1, 0), (2, 2), (3, 1)]


def test_binary_partition_guards(spark, tmp_path):
    f = str(tmp_path / "p.bin")
    with pytest.raises(ValueError, match="width"):
        r7.write_binary_partition(_partition(spark, [(0, 1)]), f, width=5)
    with pytest.raises(ValueError, match="dense"):
        r7.write_binary_partition(_partition(spark, [(0, 1), (2, 1)]), f)
    with pytest.raises(ValueError, match="width 4"):
        r7.write_binary_partition(_partition(spark, [(0, 1 << 33)]), f, width=4)
    # truncated file rejected
    with open(f, "wb") as fh:
        fh.write(b"\x01\x02\x03")
    with pytest.raises(ValueError, match="multiple"):
        r7.read_binary_partition(spark, f, width=8)


def test_binary_edge_list_partition_roundtrip_and_multifile(spark, tmp_path):
    p = _partition(spark, [(0, 5), (7, 1), (3, 2)])
    f = str(tmp_path / "elp.bin")
    r7.write_binary_edge_list_partition(p, f, first_node=10, width=4)
    back = r7.read_binary_edge_list_partition(spark, f, first_node=10, width=4)
    assert sorted(map(tuple, back.collect())) == [(0, 5), (3, 2), (7, 1)]

    # the reference reader concatenates multiple files in order
    p2 = _partition(spark, [(9, 4)])
    f2 = str(tmp_path / "elp2.bin")
    r7.write_binary_edge_list_partition(p2, f2, first_node=10, width=4)
    both = r7.read_binary_edge_list_partition(
        spark, [f, f2], first_node=10, width=4
    )
    assert sorted(map(tuple, both.collect())) == [(0, 5), (3, 2), (7, 1), (9, 4)]

    with pytest.raises(ValueError, match="first_node"):
        r7.read_binary_edge_list_partition(spark, f, first_node=99, width=4)


def test_edge_list_cover_reader(spark, tmp_path):
    f = tmp_path / "cover.txt"
    f.write_text("# comment\n1 0 2\n2 1\n\n3 0 1 2\n")
    got = sorted(
        map(tuple, r7.read_edge_list_cover(spark, str(f), first_node=1).collect())
    )
    assert got == [(0, 0), (0, 2), (1, 1), (2, 0), (2, 1), (2, 2)]


def test_snap_partition_line_numbers_include_comments(spark, tmp_path):
    """The reference increments the community counter for EVERY physical
    line, comments included — line 1 is the '#' header, so the first
    real community gets id 2."""
    f = tmp_path / "snap.txt"
    f.write_text("# Communities\n10 11\n\n12\n")
    got = sorted(map(tuple, r7.read_snap_edge_list_partition(spark, str(f)).collect()))
    assert got == [(10, 2), (11, 2), (12, 4)]


def test_dot_partition_writer(spark, tmp_path):
    eu = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src LONG, dst LONG"
    )
    p = _partition(spark, [(0, 7), (1, 3), (2, 7)])
    f = str(tmp_path / "g.dot")
    r7.write_dot_partition(eu, p, f)
    txt = open(f).read()
    assert txt.startswith("graph {\n") and txt.endswith("}\n")
    # ascending cluster order: 3 -> hue 0.0, 7 -> hue 0.5
    assert '1 [style=filled, color="0.0,0.99,0.99", label=3];' in txt
    assert '0 [style=filled, color="0.5,0.99,0.99", label=7];' in txt
    assert "0 -- 1;" in txt and "1 -- 2;" in txt and "2 -- 1;" not in txt


def test_line_file_reader(spark, tmp_path):
    f = str(tmp_path / "lines.txt")
    with open(f, "w") as fh:
        fh.write("alpha\n# comment stays verbatim\n\nbeta\n")
    rows = sorted(
        (r["line_no"], r["line"]) for r in r7.read_line_file(spark, f).collect()
    )
    assert rows == [(0, "alpha"), (1, "# comment stays verbatim"), (2, ""), (3, "beta")]
