"""Real multi-host init path (parallel/mesh.py init_distributed):
spawn 2 coordinator-connected CPU processes and run cross-process
collectives + a sharded DP step + the dist-validation metric reducer.
Exercises the jax.distributed.initialize branch that single-process
tests never reach."""
import os
import os.path as osp
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.fast


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


# no @pytest.mark.timeout: pytest-timeout is not installed here (the mark
# would be a silent no-op); the subprocess communicate(timeout=240) below
# is the real bound.
def test_two_process_distributed_init_and_collectives():
    repo = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))
    child = osp.join(repo, 'tests', '_multihost_child.py')
    port = _free_port()

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop('JAX_PLATFORMS', None)
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env['JAX_PLATFORMS'] = 'cpu'
        env['JAX_COORDINATOR_ADDRESS'] = f'127.0.0.1:{port}'
        env['JAX_NUM_PROCESSES'] = '2'
        env['JAX_PROCESS_ID'] = str(rank)
        env['PYTHONPATH'] = os.pathsep.join(
            p for p in [repo, env.get('PYTHONPATH', '')] if p)
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f'rank {rank} timed out')
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
        assert f'MULTIHOST_OK rank={rank}' in out, out
