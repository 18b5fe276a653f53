from .app import InferenceSession, InpaintApp, make_app
