from .patch_match_kernel import match_argmax

__all__ = ['match_argmax']
