# Import app submodules directly (e.g. dxrexperiments_tpu.app.headless);
# importing them here would trip runpy warnings under `python -m`.
