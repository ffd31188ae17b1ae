"""Serving daemon queue-loop mechanics (file protocol, error isolation,
shutdown) with a stub pipeline — the compiled-bucket reuse itself is the
STARPipeline._run_cache behavior tested in test_pipeline_e2e."""

import json
import os

import numpy as np


class StubPipe:
    def __init__(self):
        self.calls = []

    def enhance_a_video(self, frames, prompt, seed=666):
        self.calls.append((frames.shape, prompt, seed))
        if prompt == 'boom':
            raise RuntimeError('denoiser exploded')
        f, h, w, _ = frames.shape
        return np.zeros((f, h * 4, w * 4, 3), np.uint8)


def _write_clip(path):
    import cv2
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 8, (16, 12))
    for _ in range(4):
        vw.write(np.zeros((12, 16, 3), np.uint8))
    vw.release()


def test_serve_loop_processes_queue_and_shuts_down(tmp_path):
    from star_tpu.cli.serve import serve_loop

    qdir = tmp_path / 'q'
    sdir = tmp_path / 'out'
    qdir.mkdir()
    clip = str(tmp_path / 'in.mp4')
    _write_clip(clip)

    (qdir / 'a.json').write_text(json.dumps(
        {'input_path': clip, 'prompt': 'hello', 'seed': 7,
         'output_name': 'a_out.mp4'}))
    (qdir / 'b.json').write_text(json.dumps(
        {'input_path': clip, 'prompt': 'boom'}))
    (qdir / 'shutdown').write_text('')

    pipe = StubPipe()
    serve_loop(pipe, str(qdir), str(sdir), poll_secs=0.01)
    # shutdown sentinel consumed BEFORE requests -> nothing ran
    assert not pipe.calls

    (qdir / 'shutdown').write_text('')
    serve_loop(pipe, str(qdir), str(sdir), poll_secs=0.01)
    # ... still nothing: shutdown wins each loop entry. Re-run without it:
    assert not pipe.calls

    # now process for real: run loop in a thread, then request shutdown
    import threading
    t = threading.Thread(target=serve_loop,
                         args=(pipe, str(qdir), str(sdir), 0.01))
    t.start()
    deadline = 30.0
    import time
    while deadline > 0 and not (qdir / 'b.done.json').exists():
        time.sleep(0.05)
        deadline -= 0.05
    (qdir / 'shutdown').write_text('')
    t.join(timeout=10)
    assert not t.is_alive()

    a = json.loads((qdir / 'a.done.json').read_text())
    assert a['ok'] and os.path.exists(a['output'])
    b = json.loads((qdir / 'b.done.json').read_text())
    assert not b['ok'] and 'denoiser exploded' in b['error']
    # daemon survived the failing job and processed both
    assert len(pipe.calls) == 2
    assert pipe.calls[0][1] == 'hello' and pipe.calls[0][2] == 7
    # queue drained
    assert not [f for f in os.listdir(qdir) if f.endswith('.working')]
