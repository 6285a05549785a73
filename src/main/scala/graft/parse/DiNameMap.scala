package graft.parse

/** Field-name normalization map from the reference's Document Intelligence
  * layer (`azure_di_extractor.py:95-122`, `_map_field_name`). The network
  * extractor itself is excluded (offline, north rule), but the mapping is
  * pure data: it canonicalizes vendor-specific field spellings onto the
  * engine's field vocabulary, and the eval queries use it to normalize
  * ground-truth names (SparkEntry a6/a7 construction). Keys are matched on
  * the lowercased input, unknown names pass through lowercased — exactly
  * the reference semantics.
  *
  * At scale this is a driver-side constant: lookups resolve at plan-build
  * time (constant folding), or ship inside the broadcast signature/rule
  * table when applied per-row.
  */
object DiNameMap {

  val Mapping: Map[String, String] = Map(
    "invoiceid" -> "invoice_number",
    "invoice_id" -> "invoice_number",
    "invoicenumber" -> "invoice_number",
    "invoice_number" -> "invoice_number",
    "vendorname" -> "vendor_name",
    "suppliername" -> "vendor_name",
    "customername" -> "recipient_name",
    "vendoraddressrecipient" -> "recipient_name",
    "billingaddressrecipient" -> "recipient_name",
    "totalamount" -> "total_amount",
    "amountdue" -> "total_amount",
    "duedate" -> "due_date",
    "invoicedate" -> "date",
    "invoice_date" -> "date",
    "billingaddress" -> "supplier_address",
    "customeraddress" -> "recipient_address",
    "vendoraddress" -> "supplier_address",
    "vendortaxid" -> "vendor_tax_id",
    "customertaxid" -> "customer_tax_id",
    "totaltax" -> "total_tax",
    "invoicetotal" -> "total_amount",
    "taxdetails" -> "tax_details",
    "items" -> "line_items")

  def normalize(name: String): String = {
    val low = name.toLowerCase
    Mapping.getOrElse(low, low)
  }
}
