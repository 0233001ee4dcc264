from .seed import seed_everything
