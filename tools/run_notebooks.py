"""Execute example notebooks headlessly (the nightly smoke gate).

Runs each notebook with nbclient in its own directory, in order, so the
data/fit notebooks populate the store the analysis notebooks read. Default
set: the ps-vae and msps-vae narrative walkthroughs.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/run_notebooks.py
    python tools/run_notebooks.py examples/ps-vae/00_data_and_fit.ipynb
"""

import os
import sys
import time

DEFAULT = [
    'examples/ps-vae/00_data_and_fit.ipynb',
    'examples/ps-vae/01_psvae_analysis.ipynb',
    'examples/msps-vae/00_data_and_fit.ipynb',
    'examples/msps-vae/01_mspsvae_analysis.ipynb',
]


def run(path, timeout=1800):
    import nbformat
    from nbclient import NotebookClient
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=timeout, kernel_name='python3',
        resources={'metadata': {'path': os.path.dirname(os.path.abspath(path))}})
    t0 = time.time()
    client.execute()
    print('%s: OK (%.0fs)' % (path, time.time() - t0))


def main(paths):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    env_path = os.environ.get('PYTHONPATH', '')
    if repo not in env_path.split(os.pathsep):
        # the spawned kernels must see the repo package
        os.environ['PYTHONPATH'] = repo + (os.pathsep + env_path if env_path else '')
    failed = []
    for p in paths:
        try:
            run(p)
        except Exception as e:  # keep going; report all failures at the end
            print('%s: FAILED\n%s' % (p, str(e)[-3000:]))
            failed.append(p)
    if failed:
        print('\nfailed notebooks: %s' % failed)
    return len(failed)


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:] or DEFAULT))
