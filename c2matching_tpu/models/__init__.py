"""Stage-model factory.

Parity target: mmsr/models/__init__.py create_model (:22-43) — YAML
``model_type`` -> registered class, via the explicit MODEL_REGISTRY
instead of the *_model.py directory scan."""
import logging

from ..utils.registry import MODEL_REGISTRY
from .ref_restoration_model import RefRestorationModel  # noqa: F401
from .sr_model import SRModel  # noqa: F401
from .student_contras_distillation_model import \
    StudentContrasDistillationModel  # noqa: F401
from .teacher_contras_model import TeacherContrasModel  # noqa: F401

logger = logging.getLogger('base')


def create_model(opt):
    model = MODEL_REGISTRY.get(opt['model_type'])(opt)
    logger.info(f'Model [{model.__class__.__name__}] is created.')
    return model
