"""Observables: trajectory -> scalar/array measurements."""

from mythos_tpu.observables.base import (
    BaseObservable,
    get_duplex_quartets,
    local_helical_axis,
    local_helical_axis_with_norm,
)
from mythos_tpu.observables.bond_distances import BondDistances, BondDistancesMapped
from mythos_tpu.observables.diameter import Diameter
from mythos_tpu.observables.melting_temp import MeltingTemp
from mythos_tpu.observables.membranes import (
    AreaPerLipid,
    MembraneMeltingTemp,
    MembraneThickness,
    compute_membrane_tm,
    fit_apl_sigmoid,
)
from mythos_tpu.observables.persistence_length import PersistenceLength, persistence_length_fit
from mythos_tpu.observables.pitch import PitchAngle, compute_pitch
from mythos_tpu.observables.propeller import PropellerTwist
from mythos_tpu.observables.rise import Rise
from mythos_tpu.observables.rmse import RMSE
from mythos_tpu.observables.stretch_torsion import (
    ExtensionZ,
    TwistXY,
    stretch,
    stretch_torsion,
    torsion,
)
from mythos_tpu.observables.triplet_angles import TripletAngles, TripletAnglesMapped
from mythos_tpu.observables.wasserstein import (
    WassersteinDistance,
    WassersteinDistanceMapped,
    wasserstein_1d,
)
from mythos_tpu.observables.wlc import calculate_extension, fit_wlc

__all__ = [
    "RMSE",
    "AreaPerLipid",
    "BaseObservable",
    "BondDistances",
    "BondDistancesMapped",
    "Diameter",
    "ExtensionZ",
    "MeltingTemp",
    "MembraneMeltingTemp",
    "MembraneThickness",
    "PersistenceLength",
    "PitchAngle",
    "PropellerTwist",
    "Rise",
    "TripletAngles",
    "TripletAnglesMapped",
    "TwistXY",
    "WassersteinDistance",
    "WassersteinDistanceMapped",
    "calculate_extension",
    "compute_membrane_tm",
    "compute_pitch",
    "fit_apl_sigmoid",
    "fit_wlc",
    "get_duplex_quartets",
    "local_helical_axis",
    "local_helical_axis_with_norm",
    "persistence_length_fit",
    "stretch",
    "stretch_torsion",
    "torsion",
    "wasserstein_1d",
]
