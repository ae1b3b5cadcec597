"""Command-line applications mirroring the reference's entry points:

* ``analyze``  — batch WAV analysis          (dsp/src/main.py)
* ``live``     — streaming state-machine run (dsp/src/live/main.py)
* ``monitor``  — continuous segment monitor  (meteor_detect_class/prime_detection.py)
* ``merge``    — multi-day event CSV merge   (dsp/src/main_analyze.py)
"""
