"""typeOfIndex transform parity vs direct scalar ports of
`Sampling.scala` / `significantBits.scala`."""

import math

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.models import transforms


def scalar_sampling(key, perm):
    tmp = 0
    for j in range(32):
        tmp += (((key >> int(perm[j])) & 1) << (31 - j))
    return tmp & 0xFFFFFFFF


def scalar_continue_bits_count(key, num_of_bits=(6, 4, 2, 1)):
    first_four = (key & 0xFFFFFFFF) >> 28
    arr = [0, 0, 0, 0]
    count = 0

    def bump(c):
        if c >= num_of_bits[0]:
            arr[0] += 1; arr[1] += 1; arr[2] += 1; arr[3] += 1
        elif c >= num_of_bits[1]:
            arr[1] += 1; arr[2] += 1; arr[3] += 1
        elif c >= num_of_bits[2]:
            arr[2] += 1; arr[3] += 1
        elif c >= num_of_bits[3]:
            arr[3] += 1

    for i in range(28):
        if (key >> i) & 1:
            count += 1
            if i == 27:
                bump(count)
                count = 0
        else:
            bump(count)
            count = 0
    rev = arr[::-1]
    tmp = 0
    for i in range(4):
        tmp += rev[i] << ((3 - i) * 7)
    return (tmp + (first_four << 28)) & 0xFFFFFFFF


def scalar_angle_new_method(key):
    metric = [16.0, 25.0, 33.0, 39.0, 46.0, 52.0, 58.0, 66.0, 72.0]
    pc = bin(key & 0x0FFFFFFF).count("1")
    if pc == 0:
        angle = float("nan")
    else:
        angle = math.degrees(math.acos(pc / (math.sqrt(28) * math.sqrt(pc))))
    index = 0
    while index < 9 and angle > metric[index]:
        index += 1
    mask = 0x7F
    first4 = (key >> 28) & mask
    first7 = (key >> 21) & mask
    three7 = (key >> 7) & mask
    last7 = key & mask
    return (last7 + (three7 << 7) + (index << 14) + (first7 << 21) + (first4 << 28)) & 0xFFFFFFFF


def scalar_variable_bits(key):
    m7, m4 = 0x7F, 0xF
    first4 = (key >> 28) & m7
    first7 = (key >> 24) & m4
    second7 = (key >> 17) & m7
    three7 = (key >> 10) & m7
    last7 = (key >> 3) & m7
    return (last7 + (three7 << 7) + (second7 << 14) + (first7 << 21) + (first4 << 28)) & 0xFFFFFFFF


def _rand_keys(n=64, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    # include edge cases
    keys[:4] = [0, 0xFFFFFFFF, 0x80000000, 0x0FFFFFFF]
    return keys


def test_sampling_parity():
    perm = transforms.sampling_permutation(88387)
    keys = _rand_keys()
    got = np.asarray(transforms.sampling_one_key(jnp.asarray(keys), jnp.asarray(perm)))
    for i, k in enumerate(keys):
        assert got[i] == scalar_sampling(int(k), perm), i


def test_continue_bits_count_parity():
    keys = _rand_keys()
    got = np.asarray(transforms.continue_bits_count(jnp.asarray(keys)))
    for i, k in enumerate(keys):
        assert got[i] == scalar_continue_bits_count(int(k)), (i, hex(int(k)))


def test_angle_new_method_parity():
    keys = _rand_keys()
    got = np.asarray(transforms.angle_new_method(jnp.asarray(keys)))
    for i, k in enumerate(keys):
        assert got[i] == scalar_angle_new_method(int(k)), (i, hex(int(k)))


def test_variable_bits_parity():
    keys = _rand_keys()
    got = np.asarray(transforms.variable_bits(jnp.asarray(keys)))
    for i, k in enumerate(keys):
        assert got[i] == scalar_variable_bits(int(k)), (i, hex(int(k)))
