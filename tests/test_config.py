"""Config system: HOCON key-space compatibility and derived quantities."""

import pytest

from similaritysearchbyrdf_tpu.config import (
    RDFConfig,
    TableConfig,
    from_hocon_dict,
    parse_hocon,
    partition_config,
)


CANONICAL = """
mclab.lsh.name = angle
mclab.lsh.familySize = 100
mclab.lsh.vectorDim = 100
mclab.lsh.tableNum = 10
mclab.lsh.permutationNum = 3
mclab.lsh.typeOfIndex = original
mclab.lshTable.bufferOverflow=500
mclab.lshTable.bucketBits=28
mclab.lshTable.dirNodeSize=32
mclab.lshTable.chainLength = 32
mclab.lsh.partitionBits=3
mclab.lsh.topK = 10
mclab.lsh.family.pstable.w = 4
"""


def test_parse_hocon_and_map():
    conf = from_hocon_dict(parse_hocon(CANONICAL))
    assert conf.family_name == "angle"
    assert conf.table_num == 10
    assert conf.permutation_num == 3
    assert conf.total_tables == 30
    assert conf.lsh_table.bucket_overflow == 500
    assert conf.lsh_table.chain_length == 32
    assert conf.partition_bits == 3
    assert conf.num_partitions == 8
    assert conf.top_k == 10
    assert conf.pstable.w == 4


def test_table_derived_quantities():
    t = TableConfig(bucket_bits=28, dir_node_size=32)
    assert t.seg_bits == 4
    assert t.bits_per_level == 5
    assert t.max_tree_level == 4  # (28)/5 - 1, ref RandomDrawTreeMap.java:456
    t64 = TableConfig(dir_node_size=64)
    assert t64.max_tree_level == 3


def test_bad_dir_node_size():
    with pytest.raises(ValueError):
        TableConfig(dir_node_size=48)


def test_partition_config_synthesis():
    conf = RDFConfig(partition_bits=3, vector_dim=100)
    p = partition_config(conf)
    # mirrors DensevectorRDFInit.scala:63-70
    assert p.vector_dim == 32
    assert p.table_num == 1
    assert p.lsh_table.chain_length == 3


def test_json_roundtrip():
    conf = RDFConfig(table_num=5, partition_bits=2)
    conf2 = RDFConfig.from_json(conf.to_json())
    assert conf2 == conf
