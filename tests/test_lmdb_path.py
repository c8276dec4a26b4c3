"""lmdb data path, executed end to end (VERDICT r2 item 5).

Round-trips: packer (scripts/create_cufed_lmdb.py) ->
paired_paths_from_lmdb -> FileClient('lmdb')/LmdbBackend.get ->
RefCUFEDDataset.__getitem__. Runs on the real lmdb package when
installed, else on the in-repo API-compatible fallback store
(c2matching_tpu/utils/lmdb_shim.py) — either way the framework's own
code path executes. Upstream contract: mmsr/utils/file_client.py:96-167.
"""
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))


@pytest.fixture(scope='module')
def packed_root(tmp_path_factory):
    src = tmp_path_factory.mktemp('synth_lmdb_src')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(src), '--n', '3', '--size', '64'], check=True)
    # lmdb pairing matches input/ref by KEY (mmsr/data/util.py:84-150):
    # normalize the synth ref names (NNN_1 -> NNN_0) to the CUFED layout
    # where both databases share keys
    import os
    ref_dir = osp.join(str(src), 'ref')
    for f in os.listdir(ref_dir):
        os.rename(osp.join(ref_dir, f),
                  osp.join(ref_dir, f.replace('_1.png', '_0.png')))
    out = tmp_path_factory.mktemp('synth_lmdb_out')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'create_cufed_lmdb.py'),
         '--in_dir', osp.join(str(src), 'input'),
         '--ref_dir', osp.join(str(src), 'ref'),
         '--out_root', str(out), '--gt_size', '64'], check=True)
    return str(out)


def test_shim_env_roundtrip(tmp_path):
    """The fallback engine itself: put/get/commit/reopen/stat."""
    from c2matching_tpu.utils import lmdb_shim as lmdb
    path = str(tmp_path / 'kv.lmdb')
    env = lmdb.open(path, map_size=1 << 20)
    with env.begin(write=True) as txn:
        txn.put(b'a', b'alpha')
        txn.put(b'b', b'beta' * 100)
    env.close()

    env = lmdb.open(path, readonly=True, lock=False, readahead=False)
    assert env.stat()['entries'] == 2
    with env.begin(write=False) as txn:
        assert txn.get(b'a') == b'alpha'
        assert txn.get(b'b') == b'beta' * 100
        assert txn.get(b'missing') is None
    env.close()
    with pytest.raises(Exception):
        lmdb.open(str(tmp_path / 'nothere.lmdb'), readonly=True)


def test_packer_and_backend_roundtrip(packed_root):
    """Packer output -> LmdbBackend.get returns decodable image bytes
    for every meta_info key, in all three variants."""
    import cv2
    from c2matching_tpu.data.file_client import FileClient

    for suffix, hw in (('', 64), ('_lq', 16), ('_up', 64)):
        db = osp.join(packed_root, f'input{suffix}.lmdb')
        with open(osp.join(db, 'meta_info.txt')) as f:
            keys = [line.split('.')[0] for line in f if line.strip()]
        assert len(keys) == 3
        client = FileClient('lmdb', db_paths=[db], client_keys=['in'])
        for k in keys:
            buf = client.get(k, 'in')
            assert buf is not None
            img = cv2.imdecode(np.frombuffer(buf, np.uint8),
                               cv2.IMREAD_COLOR)
            assert img.shape == (hw, hw, 3)


def test_dataset_getitem_via_lmdb(packed_root):
    """RefCUFEDDataset with io_backend lmdb: pairing + reads + the full
    train-item pipeline over the packed store."""
    from c2matching_tpu.data.ref_cufed_dataset import RefCUFEDDataset

    opt = {
        'io_backend': {'type': 'lmdb'},
        'dataroot_in': osp.join(packed_root, 'input.lmdb'),
        'dataroot_ref': osp.join(packed_root, 'ref.lmdb'),
        'phase': 'train', 'scale': 4, 'gt_size': 64,
        'use_flip': False, 'use_rot': False,
    }
    ds = RefCUFEDDataset(opt)
    assert len(ds.paths) == 3
    item = ds[0]
    assert item['img_in'].shape == (64, 64, 3)
    assert item['img_in_lq'].shape == (16, 16, 3)
    assert item['img_in_up'].shape == (64, 64, 3)
    for v in item.values():
        if isinstance(v, np.ndarray):
            assert np.all(np.isfinite(v))
            assert 0.0 <= v.min() and v.max() <= 1.0


def test_dataset_getitem_lmdb_matches_disk(packed_root, tmp_path):
    """The lmdb-packed 'full' variant must yield the same training item
    as the disk backend over the identical source images."""
    import cv2
    from c2matching_tpu.data.file_client import FileClient
    from c2matching_tpu.data.ref_cufed_dataset import RefCUFEDDataset

    # dump the packed full images back to disk files
    disk_root = tmp_path / 'disk'
    for sub in ('input', 'ref'):
        (disk_root / sub).mkdir(parents=True)
        db = osp.join(packed_root, f'{sub}.lmdb')
        with open(osp.join(db, 'meta_info.txt')) as f:
            keys = [line.split('.')[0] for line in f if line.strip()]
        client = FileClient('lmdb', db_paths=[db], client_keys=['k'])
        for k in keys:
            with open(disk_root / sub / f'{k}.png', 'wb') as f:
                f.write(client.get(k, 'k'))

    common = {'phase': 'train', 'scale': 4, 'gt_size': 64,
              'use_flip': False, 'use_rot': False}
    ds_lmdb = RefCUFEDDataset(dict(
        common, io_backend={'type': 'lmdb'},
        dataroot_in=osp.join(packed_root, 'input.lmdb'),
        dataroot_ref=osp.join(packed_root, 'ref.lmdb')))
    ds_disk = RefCUFEDDataset(dict(
        common, io_backend={'type': 'disk'},
        dataroot_in=str(disk_root / 'input'),
        dataroot_ref=str(disk_root / 'ref')))
    a, b = ds_lmdb[1], ds_disk[1]
    for k in ('img_in', 'img_in_lq', 'img_in_up', 'img_ref'):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_real_lmdb_cross_conformance(tmp_path):
    """If the real ``lmdb`` package is ever installed here, prove the
    documented divergence behavior (utils/lmdb_shim.py docstring): the
    two stores do NOT share an on-disk format and both directions fail
    LOUDLY — the shim refuses a dir containing ``data.mdb``; real lmdb
    sees none of the shim's entries — and the real package passes the
    same API round-trip the shim pins. Skipped (not silently green)
    while lmdb is unavailable."""
    lmdb = pytest.importorskip('lmdb')
    from c2matching_tpu.utils import lmdb_shim

    # real-lmdb API round-trip (same protocol the shim tests pin above)
    real_path = str(tmp_path / 'real.lmdb')
    env = lmdb.open(real_path, map_size=1 << 20)
    with env.begin(write=True) as txn:
        txn.put(b'a', b'alpha')
    env.close()
    env = lmdb.open(real_path, readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b'a') == b'alpha'
    assert env.stat()['entries'] == 1
    env.close()

    # direction 1: shim must refuse to open a real-lmdb directory
    with pytest.raises(Exception):
        lmdb_shim.open(real_path, readonly=True)

    # direction 2: real lmdb must not silently read shim-packed data
    shim_path = str(tmp_path / 'shim.lmdb')
    senv = lmdb_shim.open(shim_path)
    with senv.begin(write=True) as txn:
        txn.put(b'a', b'alpha')
    senv.close()
    try:
        renv = lmdb.open(shim_path, readonly=True, lock=False)
    except lmdb.Error:
        pass  # loud failure: acceptable
    else:
        with renv.begin() as txn:
            assert txn.get(b'a') is None  # never the shim's value
        renv.close()


def test_shim_aborted_transaction_rolls_back(tmp_path):
    """Real-lmdb semantics: puts in an aborted write transaction must
    not be visible afterwards nor persisted by close()."""
    from c2matching_tpu.utils import lmdb_shim

    path = str(tmp_path / 'store.lmdb')
    env = lmdb_shim.open(path)
    with env.begin(write=True) as txn:
        txn.put(b'kept', b'payload-1')
        assert txn.get(b'kept') == b'payload-1'  # read-your-writes
    with pytest.raises(RuntimeError):
        with env.begin(write=True) as txn:
            txn.put(b'rolled-back', b'payload-2')
            raise RuntimeError('simulated failure mid-pack')
    with env.begin() as txn:
        assert txn.get(b'kept') == b'payload-1'
        assert txn.get(b'rolled-back') is None
    env.close()

    env2 = lmdb_shim.open(path, readonly=True)
    with env2.begin() as txn:
        assert txn.get(b'kept') == b'payload-1'
        assert txn.get(b'rolled-back') is None
    assert env2.stat()['entries'] == 1
    env2.close()
