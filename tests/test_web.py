"""Web front-end over the serve queue: HTTP enqueue/list/result/upload and
an end-to-end HTTP -> queue -> serve_loop -> result round trip (stub pipe).

Counterpart of the reference's gradio/streamlit demos
(cogvideox-based/inference/gradio_web_demo.py) — here a stateless stdlib
HTTP tier over the file queue, so the TPU daemon stays the only device
owner."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from star_tpu.cli.web import job_states, serve_web


@pytest.fixture()
def web(tmp_path):
    qdir, sdir, udir = (tmp_path / 'q', tmp_path / 'out', tmp_path / 'up')
    qdir.mkdir(), sdir.mkdir()
    srv = serve_web(str(qdir), str(sdir), str(udir), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    yield base, qdir, sdir, udir
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read()


def _req(url, data, method='POST', ctype='application/json'):
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={'Content-Type': ctype})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_enqueue_json_and_form(web):
    base, qdir, _, _ = web
    st, body = _req(f'{base}/enqueue',
                    json.dumps({'input_path': '/x/a.mp4',
                                'prompt': 'p', 'seed': 3}).encode())
    assert st == 200
    job = json.loads(body)['job']
    req = json.load(open(qdir / f'{job}.json'))
    assert req == {'input_path': '/x/a.mp4', 'prompt': 'p', 'seed': 3}

    st, body = _req(f'{base}/enqueue', b'input_path=%2Fx%2Fb.mp4&seed=7',
                    ctype='application/x-www-form-urlencoded')
    assert st == 200
    job2 = json.loads(body)['job']
    req2 = json.load(open(qdir / f'{job2}.json'))
    assert req2['input_path'] == '/x/b.mp4' and req2['seed'] == 7
    assert req2['prompt'] == 'a good video'          # default applied

    st, body = _req(f'{base}/enqueue', json.dumps({'prompt': 'x'}).encode())
    assert st == 400 and b'input_path' in body


def test_jobs_and_result_lifecycle(web):
    base, qdir, _, _ = web
    _, body = _req(f'{base}/enqueue',
                   json.dumps({'input_path': '/x/a.mp4'}).encode())
    job = json.loads(body)['job']
    assert json.loads(_get(f'{base}/jobs')[1])[job]['state'] == 'queued'
    st, body = _get_result(base, job)
    assert st == 404 and json.loads(body)['state'] == 'queued'

    # daemon takes it ...
    os.rename(qdir / f'{job}.json', qdir / f'{job}.json.working')
    assert json.loads(_get(f'{base}/jobs')[1])[job]['state'] == 'working'
    # ... and finishes
    (qdir / f'{job}.json.working').unlink()
    (qdir / f'{job}.done.json').write_text(
        json.dumps({'ok': True, 'output': 'o.mp4', 'seconds': 1.0}))
    jobs = json.loads(_get(f'{base}/jobs')[1])
    assert jobs[job] == {'state': 'done',
                         'result': {'ok': True, 'output': 'o.mp4',
                                    'seconds': 1.0}}
    st, body = _get_result(base, job)
    assert st == 200 and json.loads(body)['ok'] is True
    # the index page renders the table without blowing up
    st, html = _get(f'{base}/')
    assert st == 200 and job.encode() in html


def _get_result(base, job):
    try:
        with urllib.request.urlopen(f'{base}/result/{job}') as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_upload_and_video_download(web):
    base, _, sdir, udir = web
    st, body = _req(f'{base}/upload/in.mp4', b'\x00\x01abc', method='PUT')
    assert st == 200
    p = json.loads(body)['input_path']
    assert open(p, 'rb').read() == b'\x00\x01abc'
    assert os.path.dirname(p) == str(udir)

    (sdir / 'clip.mp4').write_bytes(b'VID')
    st, body = _get(f'{base}/video/clip.mp4')
    assert st == 200 and body == b'VID'
    st, _ = _get_result(base, '%2e%2e%2fevil')   # traversal rejected
    assert st == 400
    try:
        with urllib.request.urlopen(f'{base}/video/none.mp4') as r:
            st = r.status
    except urllib.error.HTTPError as e:
        st = e.code
    assert st == 404


def test_http_to_serve_loop_round_trip(web, tmp_path):
    """Full path: HTTP enqueue -> file queue -> serve_loop (stub pipe)
    -> done file visible over HTTP."""
    from star_tpu.cli.serve import serve_loop
    from tests.test_serve import StubPipe, _write_clip
    base, qdir, sdir, _ = web
    clip = tmp_path / 'in.mp4'
    _write_clip(str(clip))
    _, body = _req(f'{base}/enqueue',
                   json.dumps({'input_path': str(clip),
                               'output_name': 'out.mp4'}).encode())
    job = json.loads(body)['job']
    # shutdown wins each loop entry (see test_serve), so run the daemon
    # loop in a thread, wait for the done file, then request shutdown
    import time
    t = threading.Thread(target=serve_loop,
                         args=(StubPipe(), str(qdir), str(sdir), 0.01))
    t.start()
    deadline = 30.0
    while deadline > 0 and not (qdir / f'{job}.done.json').exists():
        time.sleep(0.05)
        deadline -= 0.05
    (qdir / 'shutdown').touch()
    t.join(timeout=10)
    assert not t.is_alive()
    st, body = _get_result(base, job)
    assert st == 200
    res = json.loads(body)
    assert res['ok'] is True and os.path.exists(res['output'])
