"""Public one-call API (reference: `api/vmc_api.h` VmcOptimize :80 /
MonteCarloMeasure :138 and `api/conversions.h`)."""
from __future__ import annotations

from peps_tpu.algorithm.measure import (MeasurementParams, MeasureResult,
                                        measure)
from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.vmc_optimize import VMCParams, VMCResult, vmc_optimize
from peps_tpu.algorithm.exact_sum import (all_configs, exact_sum_evaluation,
                                          exact_sum_energy_gradient,
                                          pad_configs, sector_configs)
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.engine import (init_configs_occupancy,
                                        init_configs_uniform)
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer.optimizer import (AdaGradParams, AdamParams,
                                          LBFGSParams, MinSRParams,
                                          OptimizerParams, SGDParams,
                                          SRParams)
from peps_tpu.peps import (PEPS, SimpleUpdateParams, product_peps,
                           product_peps_pbc, simple_update, to_tps,
                           to_tps_pbc)
from peps_tpu.peps_cluster import simple_update_nnn, simple_update_triangle
from peps_tpu.loop_update import LoopUpdateParams, loop_update
from peps_tpu.models import fermion, spin
from peps_tpu.algorithm.energy_fermion import FermionTensors
from peps_tpu.algorithm.energy import (ModelTensors,
                                       local_energy_and_holes_dressed,
                                       psi_consistency_check)
from peps_tpu.algorithm.exact_measure import exact_sum_measure
from peps_tpu.algorithm.measure_fermion import tj_singlet_pair_corr_row
from peps_tpu.contraction.pbc import (amplitude_pbc, contract_pbc,
                                      punch_all_holes_pbc)
from peps_tpu.montecarlo.jastrow import JastrowDress
from peps_tpu.montecarlo.engine import load_configs, save_configs
from peps_tpu.tps import (expand_bond_dim, load_tps, project, random_tps,
                          save_tps, wavefunction_sum)
from peps_tpu.contraction.bmps import entanglement_entropy
from peps_tpu.algorithm.registry import (Observable,
                                         structure_factor_spsm_row)
from peps_tpu.fermion.tables import fermion_ratio_tables
# Z2-graded fermionic backend (graded tensors, fermionic simple update,
# dressed projection, graded VMC)
from peps_tpu.fermion.peps import (FermionSpace, fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.fermion.convert import fermion_project
from peps_tpu.fermion.vmc import (GradedFermionModel, amplitude_fermion,
                                  local_energy_and_holes_graded,
                                  mc_sweep_fermion,
                                  mc_sweep_fermion_shared)

__all__ = [
    "BoundaryCondition", "TruncParams", "UpdateRule",
    "MCParams", "MeasurementParams", "MeasureResult", "measure",
    "VMCParams", "VMCResult", "vmc_optimize",
    "all_configs", "sector_configs", "exact_sum_evaluation",
    "exact_sum_energy_gradient",
    "init_configs_occupancy", "init_configs_uniform",
    "SGDParams", "AdaGradParams", "AdamParams", "SRParams", "MinSRParams",
    "LBFGSParams", "OptimizerParams",
    "PEPS", "SimpleUpdateParams", "product_peps", "product_peps_pbc",
    "simple_update", "to_tps", "to_tps_pbc",
    "random_tps", "project", "save_tps", "load_tps",
    "simple_update_nnn", "simple_update_triangle",
    "LoopUpdateParams", "loop_update",
    "fermion", "spin", "FermionTensors", "ModelTensors",
    "local_energy_and_holes_dressed", "psi_consistency_check",
    "exact_sum_measure", "tj_singlet_pair_corr_row",
    "amplitude_pbc", "contract_pbc", "punch_all_holes_pbc",
    "JastrowDress", "load_configs", "save_configs",
    "FermionSpace", "space_for_model", "product_fermion_peps",
    "fermion_simple_update", "to_tps_fermion", "fermion_project",
    "GradedFermionModel", "amplitude_fermion",
    "local_energy_and_holes_graded", "mc_sweep_fermion",
    "mc_sweep_fermion_shared",
    "wavefunction_sum", "expand_bond_dim", "entanglement_entropy",
    "Observable",
    "structure_factor_spsm_row", "fermion_ratio_tables",
]
