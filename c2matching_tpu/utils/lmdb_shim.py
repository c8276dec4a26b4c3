"""Minimal lmdb-API-compatible fallback key-value store.

The real ``lmdb`` package is a C extension that is not installable in
this environment (no package index access), which previously left the
whole lmdb data path (scripts/create_cufed_lmdb.py packing ->
``paired_paths_from_lmdb`` -> ``LmdbBackend.get`` -> dataset
``__getitem__``) implemented but never executed. This shim implements
the small API subset the framework uses — ``open()``, ``Environment.
begin()/close()/stat()``, ``Transaction.get()/put()`` with
commit-on-clean-exit context-manager semantics — over an append-only
data file plus a JSON index, so those code paths run end to end here.

The on-disk format is deliberately NOT lmdb: files are named
``fallback_data.bin`` / ``fallback_index.json`` inside the ``*.lmdb``
directory, and opening a directory that contains a real ``data.mdb``
raises with a clear message. When the real package is installed the
importers (``data/file_client.py``, ``scripts/create_cufed_lmdb.py``)
prefer it and nothing here is used.

DIVERGENCE RISK (explicit): archives packed with this shim are NOT
readable by real lmdb and vice versa — the two stores share only the
Python API, not bytes. A dataset dir packed here must be re-packed with
``scripts/create_cufed_lmdb.py`` once the real package is available
(the packer re-reads the source images; nothing is lost). Both
directions fail loudly rather than silently misread: real lmdb ignores
our fallback files and reports an empty/absent ``data.mdb``, while this
shim refuses to open a dir containing ``data.mdb`` (``open()`` below).
``tests/test_lmdb_path.py::test_real_lmdb_cross_conformance`` runs the
cross-read check automatically if ``lmdb`` is ever installed.

Upstream contract: mmsr/utils/file_client.py:96-167 (per-key readonly
environments, ascii keys, value = encoded image bytes).
"""
import io
import json
import os
import os.path as osp
import threading

_DATA = 'fallback_data.bin'
_INDEX = 'fallback_index.json'


class Error(Exception):
    """Mirror of lmdb.Error (base class for shim failures)."""


class Transaction:

    def __init__(self, env, write):
        self._env = env
        self._write = write
        # puts are buffered per transaction and merged into the shared
        # index only on commit — an aborted write transaction leaves the
        # environment untouched, matching real lmdb semantics (the data
        # bytes appended for aborted puts become unreferenced, like
        # lmdb's own abandoned pages)
        self._pending = {}
        if write and env._readonly:
            raise Error('cannot write to a readonly environment')

    # -- context manager: commit on clean exit, abort on exception (the
    # real lmdb.Transaction does the same)
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._write:
            if exc_type is None:
                self.commit()
            else:
                self.abort()
        return False

    def get(self, key, default=None):
        k = key.decode('ascii')
        entry = self._pending.get(k) or self._env._index.get(k)
        if entry is None:
            return default
        off, length = entry
        with self._env._lock:
            self._env._data.seek(off)
            return self._env._data.read(length)

    def put(self, key, value, **kwargs):
        if not self._write:
            raise Error('put() on a read-only transaction')
        with self._env._lock:
            self._env._data.seek(0, os.SEEK_END)
            off = self._env._data.tell()
            self._env._data.write(value)
        self._pending[key.decode('ascii')] = [off, len(value)]
        return True

    def commit(self):
        if self._write:
            self._env._index.update(self._pending)
            self._pending = {}
            self._env._flush_index()

    def abort(self):
        self._pending = {}


class Environment:

    def __init__(self, path, readonly):
        self._path = path
        self._readonly = readonly
        self._lock = threading.Lock()
        if osp.exists(osp.join(path, 'data.mdb')):
            raise Error(
                f'{path} is a real lmdb database; reading it requires the '
                f'lmdb package (this is the in-repo fallback store, which '
                f'uses its own format)')
        index_path = osp.join(path, _INDEX)
        data_path = osp.join(path, _DATA)
        if osp.exists(index_path):
            with io.open(index_path) as f:
                self._index = json.load(f)
        elif readonly:
            # before any filesystem side effect: real lmdb raises on a
            # missing readonly path without creating anything — a typo'd
            # dataroot must not leave a stray empty dir behind that a
            # later writeable open would silently initialize
            raise Error(f'no fallback store at {path} (missing {_INDEX})')
        else:
            self._index = {}
        os.makedirs(path, exist_ok=True)
        if readonly:
            self._data = io.open(data_path, 'rb')
        else:
            self._data = io.open(data_path, 'a+b')

    def begin(self, write=False, **kwargs):
        return Transaction(self, write)

    def stat(self):
        return {'entries': len(self._index)}

    def _flush_index(self):
        self._data.flush()
        tmp = osp.join(self._path, _INDEX + '.tmp')
        with io.open(tmp, 'w') as f:
            json.dump(self._index, f)
        os.replace(tmp, osp.join(self._path, _INDEX))

    def close(self):
        if not self._readonly:
            self._flush_index()
        self._data.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(path, readonly=False, lock=True, readahead=True, map_size=None,
         **kwargs):  # noqa: A001 - lmdb API name
    """lmdb.open-compatible constructor (extra kwargs accepted+ignored:
    the shim has no mmap/locking knobs to tune)."""
    return Environment(path, readonly=readonly)
