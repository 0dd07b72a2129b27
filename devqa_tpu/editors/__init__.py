from .base import VLLMEditor, EditRequest  # noqa: F401
from .null import NullEditor  # noqa: F401
from .ft_vl import FTvl, FTvlConfig  # noqa: F401
from .liveedit import LiveEdit, LiveEditConfig, LiveEditTrainable  # noqa: F401
from .mend_vl import MENDvl, MENDvlConfig, MENDvlTrainable  # noqa: F401
from .serac_vl import SERACvl, SERACvlConfig, SERACvlTrainable  # noqa: F401
from .tp_vl import TPvl, TPvlConfig  # noqa: F401
from .lte_vl import LTEvl, LTEvlConfig, LTEvlTrainable  # noqa: F401
from .recipe_vl import RECIPEvl, RECIPEvlConfig, RECIPEvlTrainable  # noqa: F401
from .lemoe_vl import LEMoEvl, LEMoEvlConfig  # noqa: F401
from .ike import IKE, IKEConfig, encode_ike_facts  # noqa: F401
