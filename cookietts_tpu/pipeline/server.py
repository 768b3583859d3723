"""HTTP inference service.

Capability rebuild of CookieTTS/_5_infer/t2s_server/app.py (Flask+Tornado,
routes ``/``, ``/tts``; 15 form fields, app.py:32-51). Implemented
directly on tornado (present in the environment; flask is not).

Endpoints:
- GET  ``/``     — minimal HTML form (templates/main.html equivalent).
- POST ``/tts``  — form or JSON fields: ``input_text``, ``speaker`` (list
  or comma-separated), ``use_arpabet``, ``multispeaker_mode``,
  ``target_score``, ``batch_size``, ``max_attempts``; returns a WAV file
  (or JSON stats with ``stats_only=1``).
"""
from __future__ import annotations

import io
import json
from typing import Any, Dict, Optional

import numpy as np

_FORM_HTML = """<!doctype html>
<title>cookietts_tpu</title>
<h1>cookietts_tpu TTS server</h1>
<form action="/tts" method="post">
  <textarea name="input_text" rows="8" cols="80"
    placeholder="Text to synthesize..."></textarea><br>
  Speaker: <input name="speaker" value=""><br>
  Multispeaker mode:
  <select name="multispeaker_mode">
    <option>cycle next</option><option>cycle all</option>
    <option>random</option>
  </select><br>
  Target score: <input name="target_score" value="0.75">
  Batch size: <input name="batch_size" value="32">
  Max attempts: <input name="max_attempts" value="64"><br>
  <input type="checkbox" name="use_arpabet" checked> Use ARPAbet<br>
  <input type="submit" value="Synthesize">
</form>"""


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()


def make_app(t2s, default_speaker: Optional[str] = None):
    """Build the tornado Application around a :class:`T2S` worker."""
    import tornado.web

    class MainHandler(tornado.web.RequestHandler):
        def get(self):
            self.write(_FORM_HTML)

    class TTSHandler(tornado.web.RequestHandler):
        def post(self):
            if self.request.headers.get("Content-Type", "").startswith(
                    "application/json"):
                args: Dict[str, Any] = json.loads(self.request.body)
                get = args.get
            else:
                get = lambda k, d=None: self.get_body_argument(k, d)

            text = get("input_text") or get("text") or ""
            speaker = get("speaker") or default_speaker or ""
            if isinstance(speaker, str):
                speaker = [s.strip() for s in speaker.split(",")
                           if s.strip()]
            result = t2s.infer(
                text,
                speaker=speaker,
                speaker_mode=get("multispeaker_mode", "cycle next"),
                use_arpabet=str(get("use_arpabet", "0")).lower()
                in ("1", "true", "on"),
                target_score=float(get("target_score", 0.75)),
                batch_size=int(get("batch_size", 32)),
                max_attempts=int(get("max_attempts", 64)),
            )
            stats = {
                "segments": result["segments"],
                "speakers": result["speakers"],
                "scores": [float(s) for s in result["scores"]],
                "attempts": [int(a) for a in result["attempts"]],
                "failure_rate": result["failure_rate"],
                "audio_seconds": result["audio_seconds"],
                "total_time": result["total_time"],
                "xrt": result["xrt"],
            }
            if str(get("stats_only", "0")).lower() in ("1", "true", "on") \
                    or len(result["audio"]) == 0:
                self.set_header("Content-Type", "application/json")
                self.write(json.dumps(stats))
                return
            self.set_header("Content-Type", "audio/wav")
            self.set_header("X-TTS-Stats", json.dumps(stats))
            self.write(_wav_bytes(result["audio"], t2s.sample_rate))

    return tornado.web.Application([
        (r"/", MainHandler),
        (r"/tts", TTSHandler),
    ])


def serve(t2s, port: int = 5000):
    import tornado.ioloop
    app = make_app(t2s)
    app.listen(port)
    print(f"cookietts_tpu server on :{port}")
    tornado.ioloop.IOLoop.current().start()
