package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** The DI field-name normalization table must match the reference mapping
  * (`azure_di_extractor.py:95-122`) entry for entry.
  */
class DiNameMapSpec extends AnyFunSuite {

  test("all reference mapping entries normalize to their canonical names") {
    val expected = Map(
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
    assert(DiNameMap.Mapping == expected)
    expected.foreach { case (k, v) => assert(DiNameMap.normalize(k) == v) }
  }

  test("matching is case-insensitive on the input, like the reference's .lower()") {
    assert(DiNameMap.normalize("InvoiceId") == "invoice_number")
    assert(DiNameMap.normalize("AmountDue") == "total_amount")
    assert(DiNameMap.normalize("VendorAddressRecipient") == "recipient_name")
  }

  test("unknown names pass through lowercased") {
    assert(DiNameMap.normalize("Some_Custom_Field") == "some_custom_field")
    assert(DiNameMap.normalize("email") == "email")
  }
}
