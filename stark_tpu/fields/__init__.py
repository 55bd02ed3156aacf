from stark_tpu.fields.element import FieldElement, fe
from stark_tpu.fields.fp import Fp

__all__ = ["FieldElement", "fe", "Fp"]
