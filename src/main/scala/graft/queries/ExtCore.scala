package graft.queries

/** The assembly self-type every extension-family trait sees: the union
  * of all families plus the shared base. Family traits self-type to
  * THIS trait (the cake pattern), so any gate or oracle string may
  * reference any other family's members without import gymnastics,
  * while each family lives in its own reviewable file. */
private[queries] trait ExtCore extends ExtBase
  with ExtDedupGates with ExtQualityGates with ExtAnnGates
  with ExtGraphGates with ExtRetrievalGates with ExtStreamGates
  with ExtEngineOpsGates
